"""`python -m crypto_data_pipeline_spark <command>` — see cli.py."""

from crypto_data_pipeline_spark.cli import main

raise SystemExit(main())
