"""Minimal in-process S3-compatible HTTP server (stdlib only).

The reference proves its storage layer against a real S3 endpoint (MinIO,
internal/integration_tests/s3_test.go:58-293). No network or S3 SDK mocks in
this container, so this implements just enough of the S3 REST protocol for
pyarrow's C++ S3FileSystem to list, read (ranged GETs) and write (multipart
upload) against localhost:

- GET    /bucket?list-type=2&prefix=&delimiter=   → ListObjectsV2 XML
- GET    /bucket/key  (Range: bytes=a-b)          → object bytes / 206
- HEAD   /bucket/key                              → metadata
- PUT    /bucket                                  → create bucket
- PUT    /bucket/key                              → put object
- POST   /bucket/key?uploads                      → create multipart upload
- PUT    /bucket/key?partNumber=N&uploadId=U      → upload part
- POST   /bucket/key?uploadId=U                   → complete multipart
- DELETE /bucket/key[?uploadId=U]                 → delete / abort

Signature headers are accepted and ignored (the SDK signs; we don't verify).
aws-chunked request payloads (SigV4 streaming) are de-framed before storage.
"""

from __future__ import annotations

import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))


class _State:
    def __init__(self):
        self.buckets: dict[str, dict[str, bytes]] = {}
        self.uploads: dict[str, dict[int, bytes]] = {}  # uploadId → parts
        self.upload_keys: dict[str, tuple[str, str]] = {}
        self.lock = threading.Lock()
        self.next_upload = 0


def _decode_aws_chunked(body: bytes) -> bytes:
    """De-frame aws-chunked content: '<hex>;chunk-signature=..\\r\\n<data>\\r\\n'
    repeated, terminated by a 0-size chunk (possibly with trailers)."""
    out = bytearray()
    pos = 0
    while pos < len(body):
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            break
        header = body[pos:nl]
        size_hex = header.split(b";", 1)[0]
        try:
            size = int(size_hex, 16)
        except ValueError:
            break
        if size == 0:
            break
        start = nl + 2
        out += body[start:start + size]
        pos = start + size + 2  # skip trailing \r\n
    return bytes(out)


def make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # silence
            pass

        # ---- helpers ----
        def _parts(self):
            u = urlparse(self.path)
            segs = unquote(u.path).lstrip("/").split("/", 1)
            bucket = segs[0]
            key = segs[1] if len(segs) > 1 else ""
            q = parse_qs(u.query, keep_blank_values=True)
            return bucket, key, q

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n) if n else b""
            sha = self.headers.get("x-amz-content-sha256", "")
            if sha.startswith("STREAMING") or \
                    "aws-chunked" in self.headers.get("Content-Encoding", ""):
                data = _decode_aws_chunked(data)
            return data

        def _send(self, code: int, body: bytes = b"",
                  ctype: str = "application/xml", extra: dict | None = None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            if body and self.command != "HEAD":
                self.wfile.write(body)

        def _not_found(self, head=False):
            body = (b'<?xml version="1.0"?><Error><Code>NoSuchKey</Code>'
                    b"<Message>not found</Message></Error>")
            self._send(404, b"" if head else body)

        # ---- verbs ----
        def do_GET(self):
            bucket, key, q = self._parts()
            with state.lock:
                objs = state.buckets.get(bucket)
            if objs is None:
                return self._not_found()
            if not key:  # bucket-level: list / location
                if "location" in q:
                    return self._send(200, b'<?xml version="1.0"?>'
                                      b"<LocationConstraint/>")
                return self._list(bucket, objs, q)
            with state.lock:
                data = objs.get(key)
            if data is None:
                return self._not_found()
            rng = self.headers.get("Range")
            if rng:
                m = re.match(r"bytes=(\d+)-(\d*)", rng)
                lo = int(m.group(1))
                hi = int(m.group(2)) if m.group(2) else len(data) - 1
                hi = min(hi, len(data) - 1)
                part = data[lo:hi + 1]
                return self._send(
                    206, part, "application/octet-stream",
                    {"Content-Range": f"bytes {lo}-{hi}/{len(data)}",
                     "Accept-Ranges": "bytes"})
            self._send(200, data, "application/octet-stream",
                       {"Accept-Ranges": "bytes"})

        def _list(self, bucket, objs, q):
            prefix = q.get("prefix", [""])[0]
            delim = q.get("delimiter", [""])[0]
            with state.lock:
                keys = sorted(k for k in objs if k.startswith(prefix))
            contents, common = [], []
            seen = set()
            for k in keys:
                rest = k[len(prefix):]
                if delim and delim in rest:
                    p = prefix + rest.split(delim, 1)[0] + delim
                    if p not in seen:
                        seen.add(p)
                        common.append(p)
                    continue
                with state.lock:
                    size = len(objs[k])
                contents.append(
                    f"<Contents><Key>{_xml_escape(k)}</Key><Size>{size}</Size>"
                    "<LastModified>2024-01-01T00:00:00.000Z</LastModified>"
                    '<ETag>"0"</ETag><StorageClass>STANDARD</StorageClass>'
                    "</Contents>")
            cps = "".join(f"<CommonPrefixes><Prefix>{_xml_escape(p)}</Prefix>"
                          "</CommonPrefixes>" for p in common)
            body = (f'<?xml version="1.0"?><ListBucketResult>'
                    f"<Name>{bucket}</Name><Prefix>{_xml_escape(prefix)}</Prefix>"
                    f"<KeyCount>{len(contents) + len(common)}</KeyCount>"
                    f"<MaxKeys>1000</MaxKeys><IsTruncated>false</IsTruncated>"
                    f"{''.join(contents)}{cps}</ListBucketResult>").encode()
            self._send(200, body)

        def do_HEAD(self):
            bucket, key, _ = self._parts()
            with state.lock:
                objs = state.buckets.get(bucket)
                data = None if objs is None else objs.get(key)
            if objs is None or (key and data is None):
                return self._not_found(head=True)
            if not key:
                return self._send(200)
            # body is not written for HEAD, but _send derives Content-Length
            # (the object size the SDK wants) from it
            self._send(200, data, "application/octet-stream",
                       {"Accept-Ranges": "bytes",
                        "Last-Modified": "Mon, 01 Jan 2024 00:00:00 GMT",
                        "ETag": '"0"'})

        def do_PUT(self):
            bucket, key, q = self._parts()
            body = self._body()
            with state.lock:
                if not key:
                    state.buckets.setdefault(bucket, {})
                    return self._send(200)
                if bucket not in state.buckets:
                    return self._not_found()
                if "partNumber" in q and "uploadId" in q:
                    uid = q["uploadId"][0]
                    state.uploads.setdefault(uid, {})[int(q["partNumber"][0])] = body
                    return self._send(200, b"", extra={"ETag": '"p"'})
                state.buckets[bucket][key] = body
            self._send(200, b"", extra={"ETag": '"0"'})

        def do_POST(self):
            bucket, key, q = self._parts()
            self._body()
            with state.lock:
                if bucket not in state.buckets:
                    return self._not_found()
                if "uploads" in q:
                    state.next_upload += 1
                    uid = f"u{state.next_upload}"
                    state.uploads[uid] = {}
                    state.upload_keys[uid] = (bucket, key)
                    body = (f'<?xml version="1.0"?><InitiateMultipartUploadResult>'
                            f"<Bucket>{bucket}</Bucket><Key>{_xml_escape(key)}</Key>"
                            f"<UploadId>{uid}</UploadId>"
                            f"</InitiateMultipartUploadResult>").encode()
                    return self._send(200, body)
                if "uploadId" in q:
                    uid = q["uploadId"][0]
                    parts = state.uploads.pop(uid, {})
                    b, k = state.upload_keys.pop(uid, (bucket, key))
                    state.buckets[b][k] = b"".join(
                        parts[i] for i in sorted(parts))
                    body = (f'<?xml version="1.0"?><CompleteMultipartUploadResult>'
                            f"<Bucket>{b}</Bucket><Key>{_xml_escape(k)}</Key>"
                            f'<ETag>"0"</ETag></CompleteMultipartUploadResult>'
                            ).encode()
                    return self._send(200, body)
            self._send(400)

        def do_DELETE(self):
            bucket, key, q = self._parts()
            with state.lock:
                if "uploadId" in q:
                    state.uploads.pop(q["uploadId"][0], None)
                    state.upload_keys.pop(q["uploadId"][0], None)
                elif key:
                    state.buckets.get(bucket, {}).pop(key, None)
                else:
                    state.buckets.pop(bucket, None)
            self._send(204)

    return Handler


class MockS3Server:
    """Context manager: spins the server on an ephemeral localhost port."""

    def __init__(self):
        self.state = _State()
        self.server = ThreadingHTTPServer(("127.0.0.1", 0),
                                          make_handler(self.state))
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *a):
        self.server.shutdown()
        self.server.server_close()

    @property
    def endpoint(self) -> str:
        return f"127.0.0.1:{self.port}"
