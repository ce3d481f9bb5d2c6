from datapoints_csv_extractor_spark.cli import main

raise SystemExit(main())
