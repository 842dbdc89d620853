from . import strings, numeric, nulls, dates, dedup, setops

__all__ = ["strings", "numeric", "nulls", "dates", "dedup", "setops"]
