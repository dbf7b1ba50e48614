from . import closure, dedup, fuzzy_join, pit, sessionize, similarity, survival  # noqa: F401
