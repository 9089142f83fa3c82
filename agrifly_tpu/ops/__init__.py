from agrifly_tpu.ops import filters, poly, rootfind, rotation  # noqa: F401
