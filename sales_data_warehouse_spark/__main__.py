from sales_data_warehouse_spark.cli import main

raise SystemExit(main())
