from .warc import read_warc, pages_from_warc  # noqa: F401
