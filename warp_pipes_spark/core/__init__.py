from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.core.fingerprint import get_fingerprint

__all__ = ["Pipe", "get_fingerprint"]
