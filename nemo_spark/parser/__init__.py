from nemo_spark.parser.rls import parse_rls
from nemo_spark.parser.compile import compile_program
from nemo_spark.parser.runner import RlsRunner, run_rls

__all__ = ["parse_rls", "compile_program", "RlsRunner", "run_rls"]
