from vunnel_spark.cli import main

raise SystemExit(main())
