from pgsf_spark.schema.sftypes import (  # noqa: F401
    UnsupportedTypeError,
    describe_to_struct,
    explode_address,
    sf_type_to_spark,
)
from pgsf_spark.schema.mapping import (  # noqa: F401
    TableDesc,
    generate_mapping_rows,
    parse_mapping_csv,
    select_cdc_timestamp,
    select_pk,
    write_mapping_csv,
)
