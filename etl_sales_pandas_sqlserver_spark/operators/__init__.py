from . import strings, numeric, nulls, dates, dedup, quality, setops, scale

__all__ = [
    "strings",
    "numeric",
    "nulls",
    "dates",
    "dedup",
    "quality",
    "setops",
    "scale",
]
