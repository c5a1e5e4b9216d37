"""Pipeline plane: Spark session, extraction job topology, queries."""
from .session import get_spark

__all__ = ["get_spark"]
