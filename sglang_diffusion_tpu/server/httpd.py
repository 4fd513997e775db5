"""Minimal dependency-free async HTTP/1.1 server.

The reference serves via FastAPI/uvicorn (srt/entrypoints/http_server.py);
this image has neither, so the TPU build ships a small asyncio HTTP server
with just what the API needs: routing, JSON bodies, SSE streaming responses,
and keep-alive. ~200 lines, stdlib only.
"""

from __future__ import annotations

import asyncio
import json
import traceback
from typing import Any, AsyncIterator, Callable, Dict, Optional, Tuple
from urllib.parse import parse_qs, urlparse

from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("httpd")


class Request:
    def __init__(self, method: str, path: str, query: Dict, headers: Dict, body: bytes):
        self.method = method
        self.path = path
        self.query = query
        self.headers = headers
        self.body = body

    def json(self) -> Any:
        if not self.body:
            return {}
        return json.loads(self.body)


class Response:
    def __init__(
        self,
        body: Any = None,
        status: int = 200,
        content_type: str = "application/json",
        stream: Optional[AsyncIterator[bytes]] = None,
    ):
        self.status = status
        self.content_type = content_type
        self.stream = stream
        if stream is not None:
            self.body = b""
        elif isinstance(body, (dict, list)):
            self.body = json.dumps(body).encode()
        elif isinstance(body, str):
            self.body = body.encode()
        else:
            self.body = body or b""


def sse(data: Any) -> bytes:
    if isinstance(data, (dict, list)):
        data = json.dumps(data)
    return f"data: {data}\n\n".encode()


SSE_DONE = b"data: [DONE]\n\n"

_STATUS_TEXT = {200: "OK", 400: "Bad Request", 404: "Not Found", 500: "Internal Server Error"}


class HTTPServer:
    def __init__(self, host: str, port: int):
        self.host = host
        self.port = port
        self.routes: Dict[Tuple[str, str], Callable] = {}
        # (method, prefix) handlers for parameterized paths like
        # /v1/videos/{id}/content — checked after exact routes miss
        self.prefix_routes = []
        self._server: Optional[asyncio.AbstractServer] = None

    def prefix_route(self, method: str, prefix: str):
        def deco(fn):
            self.prefix_routes.append((method.upper(), prefix, fn))
            return fn

        return deco

    def route(self, method: str, path: str):
        def deco(fn):
            self.routes[(method, path)] = fn
            return fn

        return deco

    async def _read_request(self, reader: asyncio.StreamReader) -> Optional[Request]:
        try:
            line = await reader.readline()
        except (ConnectionResetError, asyncio.IncompleteReadError):
            return None
        if not line or line in (b"\r\n", b"\n"):
            return None
        try:
            method, target, _version = line.decode().split()
        except ValueError:
            return None
        headers: Dict[str, str] = {}
        while True:
            h = await reader.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.decode().split(":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", 0))
        body = await reader.readexactly(length) if length else b""
        parsed = urlparse(target)
        query = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        return Request(method.upper(), parsed.path, query, headers, body)

    async def _write_response(self, writer: asyncio.StreamWriter, resp: Response):
        status_line = f"HTTP/1.1 {resp.status} {_STATUS_TEXT.get(resp.status, '')}\r\n"
        writer.write(status_line.encode())
        writer.write(f"Content-Type: {resp.content_type}\r\n".encode())
        if resp.stream is None:
            writer.write(f"Content-Length: {len(resp.body)}\r\n".encode())
            writer.write(b"Connection: keep-alive\r\n\r\n")
            writer.write(resp.body)
            await writer.drain()
        else:
            writer.write(b"Transfer-Encoding: chunked\r\n")
            writer.write(b"Cache-Control: no-cache\r\nConnection: keep-alive\r\n\r\n")
            await writer.drain()
            async for chunk in resp.stream:
                writer.write(f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
                await writer.drain()
            writer.write(b"0\r\n\r\n")
            await writer.drain()

    async def _handle_conn(self, reader, writer):
        try:
            while True:
                req = await self._read_request(reader)
                if req is None:
                    break
                handler = self.routes.get((req.method, req.path))
                if handler is None:
                    for m, prefix, fn in self.prefix_routes:
                        if req.method == m and req.path.startswith(prefix):
                            handler = fn
                            break
                if handler is None:
                    resp = Response({"error": f"no route {req.method} {req.path}"}, 404)
                else:
                    try:
                        resp = await handler(req)
                    except json.JSONDecodeError:
                        resp = Response({"error": "invalid JSON body"}, 400)
                    except Exception as e:  # noqa: BLE001
                        logger.error("handler error: %s", traceback.format_exc())
                        resp = Response({"error": str(e)}, 500)
                await self._write_response(writer, resp)
        except (ConnectionResetError, asyncio.IncompleteReadError, BrokenPipeError):
            pass
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    async def start(self):
        self._server = await asyncio.start_server(
            self._handle_conn, self.host, self.port
        )
        # resolve OS-assigned port when started with port=0
        self.port = self._server.sockets[0].getsockname()[1]
        logger.info("HTTP server listening on %s:%d", self.host, self.port)

    async def serve_forever(self):
        await self.start()
        async with self._server:
            await self._server.serve_forever()

    async def stop(self):
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
