from .numeric import money, rate, round_money  # noqa: F401
from .cleaning import (  # noqa: F401
    split_index,
    strip_parens,
    concat_url,
    safe_int,
    safe_decimal,
    safe_list,
    nan_to_null,
)
