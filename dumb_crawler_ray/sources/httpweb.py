"""Real-HTTP fetch backend — the production integration seam.

Mirrors the reference's SimpleHttpRenderer semantics
(J/services/renderer/SimpleHttpRenderer.java:29-52):

- request headers ``User-Agent: Mozilla/5.0`` and
  ``Accept-Charset: ISO-8859-1``
- connect timeout 10 s / read timeout 30 s: urllib exposes ONE timeout, so
  ``open()`` gets the CONNECT budget (a dead host costs 10 s, not 30) and
  the underlying socket's timeout is then raised to the read budget
  (best-effort — if the socket isn't discoverable, reads inherit the
  stricter connect budget). All three knobs flow from JobConfig
  (``fetcher.userAgent`` / ``fetcher.connectTimeoutMs`` /
  ``fetcher.readTimeoutMs``) through FetchWorker.
- non-200 responses surface as ``FetchResponse(status, "", [])`` which
  ``CrawlComponents.fetch_outcome`` maps to ``INVALID_STATUS_CODE_{code}``
- the body is decoded with the response charset (default ISO-8859-1);
  the reference's newline-stripped line-by-line read happens downstream
  in ``fetch_outcome`` (SimpleHttpRenderer.java:44-50)
- transport failures (DNS, refused, timeout) raise ``FetchTransportError``
  which FetchWorker maps to the reference's ``HTML_RENDERING_ERROR``
  (CrawlingException code, SimpleHttpRenderer.java:24-26)

Selected with config ``fetcher.mode = "http"`` (default ``"synthetic"``
keeps the sandbox path). This sandbox has no network, so the http mode
raises ``FetchTransportError`` cleanly on every fetch — the class is unit
tested against an injected transport (the same pattern as
``codec.decode_external``, functions/codec.py:64-70).

Unlike the synthetic web there is no ``image_ids`` side channel: a real
deployment derives image references from the stored page HTML downstream.
"""

from __future__ import annotations

from .synthweb import FetchResponse


class FetchTransportError(Exception):
    """A network-level fetch failure (reference: HTML_RENDERING_ERROR)."""


class HttpWeb:
    """``fetch(url) -> FetchResponse`` over real HTTP (stdlib urllib).

    ``opener`` is the transport-injection seam: anything with
    ``open(request, timeout=...)`` returning a response object with
    ``.status``, ``.headers.get_content_charset()`` and ``.read()``.
    """

    def __init__(self, user_agent: str = "Mozilla/5.0",
                 connect_timeout_s: float = 10.0,
                 read_timeout_s: float = 30.0, opener=None):
        import urllib.request

        self.user_agent = user_agent
        self.connect_timeout_s = connect_timeout_s
        self.read_timeout_s = read_timeout_s
        self._opener = opener if opener is not None else urllib.request.build_opener()

    @classmethod
    def from_config(cls, cfg, opener=None) -> "HttpWeb":
        """Construct from a JobConfig (fetcher.userAgent /
        fetcher.connectTimeoutMs / fetcher.readTimeoutMs)."""
        return cls(user_agent=cfg.fetcher_user_agent,
                   connect_timeout_s=cfg.fetcher_connect_timeout_s,
                   read_timeout_s=cfg.fetcher_read_timeout_s, opener=opener)

    @staticmethod
    def _raise_read_timeout(resp, read_timeout_s: float) -> None:
        """Best-effort: after connect succeeded under the (shorter) connect
        budget, raise the underlying socket's timeout to the read budget.
        http.client keeps the socket reachable via resp.fp.raw._sock; if
        the transport hides it, reads simply keep the connect budget."""
        fp = getattr(resp, "fp", None)
        raw = getattr(fp, "raw", fp)
        sock = getattr(raw, "_sock", None)
        if hasattr(sock, "settimeout"):
            sock.settimeout(read_timeout_s)

    def fetch(self, url: str) -> FetchResponse:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url,
            headers={"User-Agent": self.user_agent,
                     "Accept-Charset": "ISO-8859-1"},
        )
        try:
            resp = self._opener.open(req, timeout=self.connect_timeout_s)
        except urllib.error.HTTPError as e:  # non-2xx with a status line
            return FetchResponse(int(e.code), "", [])
        except Exception as e:  # DNS / refused / timeout / TLS
            raise FetchTransportError(str(e)) from e
        self._raise_read_timeout(resp, self.read_timeout_s)
        status = int(getattr(resp, "status", 200))
        if status != 200:
            return FetchResponse(status, "", [])
        charset = None
        headers = getattr(resp, "headers", None)
        if headers is not None and hasattr(headers, "get_content_charset"):
            charset = headers.get_content_charset()
        try:
            raw = resp.read()  # read timeout / reset raises HERE, not open()
        except Exception as e:  # stall / reset / incomplete read mid-body
            raise FetchTransportError(str(e)) from e
        try:
            body = raw.decode(charset or "ISO-8859-1", errors="replace")
        except LookupError:  # server sent an unknown charset token
            body = raw.decode("ISO-8859-1", errors="replace")
        return FetchResponse(200, body, [])
