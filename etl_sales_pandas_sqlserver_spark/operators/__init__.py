from . import strings, numeric, nulls, dates, dedup, setops, scale

__all__ = ["strings", "numeric", "nulls", "dates", "dedup", "setops", "scale"]
