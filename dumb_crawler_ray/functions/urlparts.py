"""Vectorized URL decomposition.

Reproduces the variable environment the reference exposes to its expression
DSL (reference: J/expression/URLExpressionEvaluator.java:33-49, which uses
okhttp ``HttpUrl``):

    url, protocol, host, path (encoded, "/" when empty), port (int,
    scheme-default when absent), query, fragment, contentType

Non-http(s) / unparseable URLs yield ``valid=False`` — the reference's
``HttpUrl.parse`` returns null there, which makes every expression evaluate
to False (J/expression/URLExpressionEvaluator.java:57-61).
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa

_DEFAULT_PORT = {"http": 80, "https": 443}

FIELDS = ("url", "protocol", "host", "path", "port", "query", "fragment")


def split_one(url: str) -> dict | None:
    """Parse one URL into the expression-variable dict; None if invalid."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in _DEFAULT_PORT or not parts.hostname:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    return {
        "url": url,
        "protocol": scheme,
        "host": parts.hostname,
        "path": parts.path or "/",
        "port": port if port is not None else _DEFAULT_PORT[scheme],
        "query": parts.query or None,
        "fragment": parts.fragment or None,
    }


def split_batch(urls) -> dict[str, pa.Array]:
    """Vectorized-per-batch URL split → columnar expression environment.

    ``urls`` is any iterable of Python strings (typically an arrow column's
    ``to_pylist``). Returns arrow arrays for every expression variable plus a
    ``valid`` boolean mask. Invalid rows carry nulls in every field.
    """
    n = len(urls)
    cols: dict[str, list] = {f: [None] * n for f in FIELDS}
    valid = np.zeros(n, dtype=bool)
    for i, u in enumerate(urls):
        d = split_one(u) if isinstance(u, str) else None
        if d is None:
            continue
        valid[i] = True
        for f in FIELDS:
            cols[f][i] = d[f]
    out = {
        "url": pa.array(cols["url"], type=pa.string()),
        "protocol": pa.array(cols["protocol"], type=pa.string()),
        "host": pa.array(cols["host"], type=pa.string()),
        "path": pa.array(cols["path"], type=pa.string()),
        "port": pa.array(cols["port"], type=pa.int32()),
        "query": pa.array(cols["query"], type=pa.string()),
        "fragment": pa.array(cols["fragment"], type=pa.string()),
        "valid": pa.array(valid),
    }
    return out
