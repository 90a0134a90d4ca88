from datacanary_spark.cli import main

raise SystemExit(main())
