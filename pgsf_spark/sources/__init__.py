from pgsf_spark.sources.entity import EntitySource  # noqa: F401
from pgsf_spark.sources.csv_io import read_pgsf_csv, write_pgsf_csv, PGSF_CSV_OPTIONS  # noqa: F401
