from .pinning import PinHandle, eager_pin, pin, pin_scope  # noqa: F401
from .etl import (  # noqa: F401
    extract_movies,
    normalize_people,
    with_surrogate_key,
    explode_names,
    build_bridge,
    upsert,
    insert_ignore,
)
