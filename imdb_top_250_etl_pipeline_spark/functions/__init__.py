from .numeric import money, money2, dec_sum, dec_avg  # noqa: F401
from .cleaning import (  # noqa: F401
    split_index,
    strip_parens,
    concat_url,
    safe_int,
    safe_decimal,
    safe_list,
    nan_to_null,
)
