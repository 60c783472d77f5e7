"""Import all query modules for their @register side effects."""

from cheetah_spark.queries import relational  # noqa: F401
