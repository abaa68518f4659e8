from chesscom_etl_tableau_spark.cli import main

raise SystemExit(main())
