from app_dupfind_spark.functions import hashing, probes, text, vectors

__all__ = ["hashing", "probes", "text", "vectors"]
