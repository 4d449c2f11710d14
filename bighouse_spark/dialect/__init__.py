from bighouse_spark.dialect.globs import expand_braces
from bighouse_spark.dialect.schema import parse_schema_string, ch_type_to_spark
from bighouse_spark.dialect.transpile import transpile

__all__ = ["expand_braces", "parse_schema_string", "ch_type_to_spark", "transpile"]
