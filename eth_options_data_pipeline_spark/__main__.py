from eth_options_data_pipeline_spark.cli import main

raise SystemExit(main())
