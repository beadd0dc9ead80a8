"""Minimal HTTP tile server shim.

Parity: /root/reference/versatiles/src/server/tile_server.rs:54 and
routes.rs:14-22 — routes:
  GET /tiles/{z}/{x}/{y}[.ext]  -> tile payload (404 when absent)
  GET /tiles.json               -> TileJSON metadata
  GET /static/<name>            -> member of a static tar
                                   (.tar / .tar.gz / .tar.br, the
                                   reference's static-content mode)

Content negotiation mirrors server/encoding.rs + optimize_compression: the
response body is recompressed per the client's Accept-Encoding (brotli >
gzip > identity) and labeled with Content-Encoding.

Serving goes through `get_tile` point lookups on the tile DataFrame — on a
Hilbert-sorted / block-grouped table the (z,x,y) predicate prunes to one
file/row-group (sources/containers.py:82). For production QPS put the tiles
behind the single-file containers instead; this shim is the functional
`versatiles serve` analog for tests and local inspection.
"""

from __future__ import annotations

import io
import json
import re
import tarfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_TILE_RE = re.compile(r"^/tiles/(\d+)/(\d+)/(\d+)(?:\.\w+)?$")

_CTYPE = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "webp": "image/webp",
    "mvt": "application/vnd.mapbox-vector-tile",
    "bin": "application/octet-stream",
}


def _load_static(path: str) -> dict[str, bytes]:
    """Members of a static tar; .gz/.br outer compression handled
    (the reference ships testdata/static.tar.{gz,br})."""
    import gzip

    from .codecs import decompress_blob

    raw = open(path, "rb").read()
    if path.endswith(".gz"):
        raw = gzip.decompress(raw)
    elif path.endswith(".br"):
        raw = decompress_blob(raw, "brotli")
    out = {}
    with tarfile.open(fileobj=io.BytesIO(raw)) as t:
        for m in t.getmembers():
            if m.isfile():
                out[m.name.lstrip("./")] = t.extractfile(m).read()
    return out


class TileHandler(BaseHTTPRequestHandler):
    df = None
    tilejson: dict = {}
    tile_fmt = "png"
    static: dict[str, bytes] = {}

    def log_message(self, *a):
        pass

    def _negotiate(self, body: bytes) -> tuple[bytes, str | None]:
        from .codecs import optimize_compression

        accepted = {
            e.split(";")[0].strip()
            for e in (self.headers.get("Accept-Encoding") or "").split(",")
            if e.strip()
        }
        out, codec = optimize_compression(body, "none", accepted)
        return out, {"gzip": "gzip", "brotli": "br"}.get(codec)

    def _send(self, body: bytes, ctype: str):
        body, encoding = self._negotiate(body)
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        if encoding:
            self.send_header("Content-Encoding", encoding)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        from .sources.containers import get_tile

        m = _TILE_RE.match(self.path)
        if m:
            z, x, y = map(int, m.groups())
            row = get_tile(self.df, z, x, y)
            if row is None:
                self.send_error(404, "tile not found")
                return
            self._send(bytes(row.bytes), _CTYPE.get(self.tile_fmt, _CTYPE["bin"]))
            return
        if self.path in ("/tiles.json", "/tiles/tiles.json"):
            self._send(json.dumps(self.tilejson).encode(), "application/json")
            return
        name = self.path.lstrip("/")
        if name.startswith("static/"):
            name = name[len("static/"):]
        if name in self.static:
            ctype = "text/html" if name.endswith(".html") else "application/octet-stream"
            self._send(self.static[name], ctype)
            return
        self.send_error(404)


def serve_tiles(
    df,
    host: str = "127.0.0.1",
    port: int = 0,
    tile_fmt: str = "png",
    static_tar: str | None = None,
):
    """Start the serve shim on a background thread. Returns (server, url);
    call server.shutdown() to stop."""
    from .sources.containers import tilejson_for

    handler = type(
        "BoundTileHandler",
        (TileHandler,),
        {
            "df": df,
            "tilejson": tilejson_for(df),
            "tile_fmt": tile_fmt,
            "static": _load_static(static_tar) if static_tar else {},
        },
    )
    srv = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://{host}:{srv.server_address[1]}"
