"""Import all query modules for their @register side effects."""

from cheetah_spark.queries import advanced  # noqa: F401
from cheetah_spark.queries import llm  # noqa: F401
from cheetah_spark.queries import multimodal  # noqa: F401
from cheetah_spark.queries import relational  # noqa: F401
from cheetah_spark.queries import scalars  # noqa: F401
from cheetah_spark.queries import streams  # noqa: F401
from cheetah_spark.queries import surface  # noqa: F401
from cheetah_spark.queries import timeseries  # noqa: F401
from cheetah_spark.queries import windows  # noqa: F401
