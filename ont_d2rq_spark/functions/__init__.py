from ont_d2rq_spark.functions.pattern import UriPattern, encode_expr, encode_py, decode_py
from ont_d2rq_spark.functions.lexical import lexical_expr, datatype_for

__all__ = ["UriPattern", "encode_expr", "encode_py", "decode_py", "lexical_expr", "datatype_for"]
