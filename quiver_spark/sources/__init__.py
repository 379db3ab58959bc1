from quiver_spark.sources.arrow_datasource import (  # noqa: F401
    ArrowIpcDataSource,
    register_arrow,
)
from quiver_spark.sources.quiver_datasource import (  # noqa: F401
    QuiverDataSource,
    register,
    ship_package,
)
