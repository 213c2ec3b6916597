from .files import load_csv, load_parquet, load_json  # noqa: F401
from .inline import inline_resource  # noqa: F401
from .rest import paginated_rest_source  # noqa: F401
