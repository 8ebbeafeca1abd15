from transforms_for_apache_kafka_connect_spark.cli import main

raise SystemExit(main())
