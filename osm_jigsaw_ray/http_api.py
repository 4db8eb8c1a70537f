"""HTTP serving layer — the reference Play API analog
(``osm-jigsaw-api/conf/routes:1-7``,
``osm-jigsaw-api/app/controllers/Application.scala:22-51``) over the
engine's tiled output:

    GET /reverse?lat&lon[&lang]   area paths enclosing the point
    GET /name?lat&lon[&lang]      naive-naming string for the point
    GET /show?q&lat&lon[&lang]    rendered graph nodes of a claimed path
    GET /points?q&lat&lon         outline ring of a claimed path's leaf
    GET /tags?osm_id&lat&lon      taggings of one osm entity (tile-local)
    GET /raster?lat&lon           materialized-raster point lookup
    GET /healthz                  liveness

Language comes from the ``lang`` query parameter or, like the
reference's ``request.acceptLanguages.headOption``, the first tag of an
``Accept-Language`` header. stdlib ``ThreadingHTTPServer`` — answers
come from the lazily-loaded tile partitions (``serve.TileServer``) and
committed raster bands (``raster.raster_lookup``); the global area pack
is never in memory, which is the whole point of serving from tiles
(reference README: tiling took the API heap from 64 GB to 4 GB).
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .serve import TileServer


def _first_accept_language(header: str | None) -> str | None:
    if not header:
        return None
    first = header.split(",")[0].split(";")[0].strip()
    return first.split("-")[0] or None


class JigsawApi:
    """Route logic, separated from the HTTP plumbing so tests can call
    it directly and the handler stays a thin adapter."""

    def __init__(
        self,
        tiles_root: str,
        *,
        tile_precision: int = 1,
        grid: str = "geohash",
        s2_level: int = 7,
        cache_tiles: int = 10,
        raster_root: str | None = None,
        raster_grid=None,
        raster_band_rows: int = 64,
    ):
        self.server = TileServer(
            tiles_root,
            tile_precision=tile_precision,
            grid=grid,
            s2_level=s2_level,
            cache_tiles=cache_tiles,
        )
        self.raster_root = raster_root
        self.raster_grid = raster_grid
        self.raster_band_rows = raster_band_rows

    def reverse(self, lat: float, lon: float, lang: str | None) -> dict:
        return self.server.reverse(lat, lon, lang)

    def name(self, lat: float, lon: float, lang: str | None) -> dict:
        return {"name": self.server.reverse(lat, lon, lang)["name"]}

    def show(self, q: str, lat: float, lon: float, lang: str | None) -> list[dict]:
        """Rendered graph nodes for a claimed ``/``-separated area-id
        path (reference ``Application.scala:54-61``)."""
        return self.server.show(q, lat, lon, lang)

    def points(self, q: str, lat: float, lon: float) -> list[dict]:
        """Outline ring of the claimed path's last resolved node
        (reference ``Application.scala:64-77``); LookupError → 404 like
        the reference's NotFound."""
        pts = self.server.points(q, lat, lon)
        if pts is None:
            raise LookupError("Not found")
        return pts

    def tags(self, osm_id: str, lat: float, lon: float) -> dict:
        """Taggings of one osm entity, answered from the tile containing
        (lat, lon) — the tile files carry exactly the tags of their own
        areas (reference ``/tags?osm_id&lat&lon`` takes the point for
        the same reason: to pick the graph segment file)."""
        joiner = self.server._joiner(self.server._tile_of(lat, lon))
        if joiner is None:
            return {"osm_id": osm_id, "tags": {}}
        return {"osm_id": osm_id, "tags": dict(joiner.taggings.get(osm_id, {}))}

    def raster(self, lat: float, lon: float) -> dict:
        if self.raster_root is None or self.raster_grid is None:
            raise LookupError("raster serving not configured")
        from .pipelines.raster import raster_lookup

        return raster_lookup(
            self.raster_root,
            self.raster_grid,
            lat,
            lon,
            band_rows=self.raster_band_rows,
        )

    def handle(self, path: str, query: dict, headers) -> tuple[int, object]:
        """(status, json-payload) for one request; raises nothing.
        Payloads are dicts except ``/show``/``/points`` (JSON arrays,
        matching the reference's ``Json.toJson(Seq[...])``)."""

        def q(name, default=None):
            vals = query.get(name)
            return vals[0] if vals else default

        try:
            if path == "/healthz":
                return 200, {"status": "ok"}
            lang = q("lang") or _first_accept_language(
                headers.get("Accept-Language")
            )
            if path == "/reverse":
                return 200, self.reverse(float(q("lat")), float(q("lon")), lang)
            if path == "/name":
                return 200, self.name(float(q("lat")), float(q("lon")), lang)
            if path == "/show":
                return 200, self.show(
                    q("q", ""), float(q("lat")), float(q("lon")), lang
                )
            if path == "/points":
                return 200, self.points(
                    q("q", ""), float(q("lat")), float(q("lon"))
                )
            if path == "/tags":
                return 200, self.tags(
                    q("osm_id", ""), float(q("lat")), float(q("lon"))
                )
            if path == "/raster":
                return 200, self.raster(float(q("lat")), float(q("lon")))
            return 404, {"error": f"no route {path}"}
        except (TypeError, ValueError) as e:
            return 400, {"error": f"bad request: {e}"}
        except LookupError as e:
            return 404, {"error": str(e)}


def make_server(api: JigsawApi, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Bind a threading HTTP server over the api (port 0 = ephemeral;
    read the bound port from ``server.server_address[1]``)."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib casing)
            u = urlparse(self.path)
            status, payload = api.handle(u.path, parse_qs(u.query), self.headers)
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        prog="osm_jigsaw_ray.http_api", description=__doc__
    )
    p.add_argument("--tiles", required=True, help="tiles/ output directory")
    p.add_argument("--tile-precision", type=int, default=1)
    p.add_argument("--tile-grid", choices=("geohash", "s2"), default="geohash")
    p.add_argument("--s2-level", type=int, default=7)
    p.add_argument("--raster", default=None, help="raster/ output directory")
    p.add_argument("--raster-rows", type=int, default=180)
    p.add_argument("--band-rows", type=int, default=30)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args(argv)
    raster_grid = None
    if args.raster:
        from .pipelines.raster import RasterGrid

        raster_grid = RasterGrid(args.raster_rows, args.raster_rows * 2)
    api = JigsawApi(
        args.tiles,
        tile_precision=args.tile_precision,
        grid=args.tile_grid,
        s2_level=args.s2_level,
        raster_root=args.raster,
        raster_grid=raster_grid,
        raster_band_rows=args.band_rows,
    )
    srv = make_server(api, args.host, args.port)
    print(f"serving on http://{args.host}:{srv.server_address[1]}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
