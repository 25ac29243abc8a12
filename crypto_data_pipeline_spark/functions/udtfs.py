"""Python UDTFs — the one reference pattern (SURVEY §2.10 U2,
`notebooks/EDA.ipynb:1596-1624`) where a per-group function RETURNS A
TABLE rather than a scalar. The engine's preferred translations are
window/SQL rewrites (zero Python), but the table-function surface
itself is part of the API contract, so it exists for real here as an
Arrow-optimized UDTF consumed via SQL ``LATERAL``.

Design rules (the same ones the Arrow operators follow):

* **Tokenize in the JVM, expand in Python.** The UDTF receives the
  already-tokenized array from the shared ``text.tokens()`` expression
  rather than re-tokenizing in Python — `str.lower`/`str.strip`
  diverge from Spark's `lower`/`trim` on non-ASCII and exotic
  whitespace (the exact bug class ADVICE flagged in the streaming
  decontaminator), so Python never re-implements normalization.
* **Arrow transfer, not pickled rows.** ``useArrow=True`` plans as
  ``ArrowEvalPythonUDTF`` (vectorized batches); the row-at-a-time
  ``BatchEvalPythonUDTF`` node is banned repo-wide by
  tests/test_plan_doctor.py.
* **Row amplification is the output itself** (~n_tokens/stride rows
  per doc) — same contract as the codegen twin
  ``operators/text.py:chunk_tokens``, which stays the 100 TB hot path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="start bigint, n_tokens bigint, chunk_text string", useArrow=True)
class ChunkToksUDTF:
    """Sliding-window chunker over a pre-tokenized document: emits one
    row per window of ``chunk`` tokens starting every ``stride``
    tokens. Exact-parity twin of ``chunk_tokens`` (same window starts
    ``sequence(0, n-1, stride)``, same trailing partial windows, null
    token arrays emit nothing — mirroring explode-of-null)."""

    def eval(self, toks, chunk: int, stride: int):
        if toks is None:
            return
        if chunk <= 0 or stride <= 0:
            raise ValueError("chunk and stride must be positive")
        t = list(toks)
        for start in range(0, len(t), stride):
            piece = t[start : start + chunk]
            yield (start, len(piece), " ".join(piece))


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the UDTF surface on a session (SQL name →
    class). Safe to call per-query: registration replaces."""
    spark.udtf.register("chunk_toks", ChunkToksUDTF)
