from topic_store_spark.cli import main

raise SystemExit(main())
