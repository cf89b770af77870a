from . import urlparts, expr, urlhash, tagging, links, codec  # noqa: F401
