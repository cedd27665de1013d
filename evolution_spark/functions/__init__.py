from evolution_spark.functions import text, vectors

__all__ = ["text", "vectors"]
