from . import synthweb  # noqa: F401
