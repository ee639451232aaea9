"""fsspec-backed object-store client (ST5).

Mirrors the reference's minio wrapper semantics
(/root/reference/internal/minioWrapper/minio.go:19-46):

- endpoint assembled from MinioConfig — ``address[:port]``, ssl flag,
  optional region, static credentials;
- ONE client per actor (built in the sink's ``__init__``, never per
  batch);
- bucket existence ensured/validated at setup (SetupBucket /
  validateBucket, minio.go:48-72);
- the never-overwrite check before every document put — StatObject,
  then PutObject only on miss (jsonutils.go:383-388);
- per-object user metadata (url/sha1/uniqueid, jsonutils.go:360-372) —
  written as a ``<object>.meta.json`` sidecar on filesystems without
  native object metadata (opt-in; the s3 path would pass it to
  PutObject natively at the marked integration point).

The filesystem is pluggable through fsspec:

- ``file://<root>`` — local parity runs (the default data plane);
- ``memory://<root>`` — tests (per-process store);
- ``s3://`` — live MinIO/S3; requires ``s3fs``, which this sandbox
  does not ship, so the construction is gated behind an import-try and
  raises a clear error instead of failing at first put.
"""

from __future__ import annotations

import json
import os

from .config import MinioConfig

__all__ = ["ObjectStoreClient", "minio_endpoint_url"]


def minio_endpoint_url(cfg: MinioConfig) -> str:
    """Endpoint URL from the parsed minio config (minio.go:19-27:
    port 0 means bare address)."""
    scheme = "https" if cfg.ssl else "http"
    if not cfg.port:
        return "%s://%s" % (scheme, cfg.address)
    return "%s://%s:%d" % (scheme, cfg.address, cfg.port)


class ObjectStoreClient:
    """One fsspec filesystem + bucket root; see module docstring."""

    def __init__(self, root_url: str, bucket: str, minio: MinioConfig | None = None):
        import fsspec

        proto, sep, rest = root_url.partition("://")
        if not sep:
            proto, rest = "file", root_url
        self.protocol = proto
        if proto == "file":
            self.fs = fsspec.filesystem("file", auto_mkdir=True)
            base = rest or "/"
        elif proto == "memory":
            self.fs = fsspec.filesystem("memory")
            base = "/" + rest.strip("/")
        elif proto == "s3":
            cfg = minio or MinioConfig()
            try:
                self.fs = fsspec.filesystem(
                    "s3",
                    key=cfg.accesskey or None,
                    secret=cfg.secretkey or None,
                    client_kwargs={
                        "endpoint_url": minio_endpoint_url(cfg),
                        **({"region_name": cfg.region} if cfg.region else {}),
                    },
                )
            except ImportError as e:  # s3fs not shipped in this sandbox
                raise RuntimeError(
                    "s3:// object store requires the s3fs package; install it "
                    "or use a file:// / memory:// root"
                ) from e
            base = rest.strip("/")
        else:
            raise ValueError("unsupported object store protocol: %r" % proto)
        self.base = (base.rstrip("/") + "/" + bucket) if bucket else base.rstrip("/")
        self.bucket = bucket
        self._setup_bucket()

    def _setup_bucket(self) -> None:
        """SetupBucket: create-if-missing then validate (minio.go:48-72).
        On s3 the bucket is expected to exist (MakeBucket needs account
        privileges a crawler may not have — validate only)."""
        if self.protocol in ("file", "memory"):
            self.fs.makedirs(self.base, exist_ok=True)
        elif not self.fs.exists(self.base):
            raise RuntimeError("bucket %s does not exist" % self.base)

    def _path(self, object_name: str) -> str:
        return self.base + "/" + object_name

    def exists(self, object_name: str) -> bool:
        return self.fs.exists(self._path(object_name))

    def put(
        self,
        object_name: str,
        text: str | bytes | memoryview,
        usermeta: dict | None = None,
        overwrite: bool = False,
    ) -> bool:
        """Write one object; returns False (no write) when it already
        exists and ``overwrite`` is unset — the reference's
        StatObject-then-Put never-overwrite rule (jsonutils.go:383-388).
        Accepts raw utf-8 bytes so Arrow payload slices avoid a decode/
        re-encode round trip."""
        path = self._path(object_name)
        if not overwrite and self.fs.exists(path):
            return False
        parent = path.rsplit("/", 1)[0]
        self.fs.makedirs(parent, exist_ok=True)
        data = text.encode("utf-8") if isinstance(text, str) else bytes(text)
        if self.protocol == "file":
            # atomic publish on the local filesystem: tmp + rename
            tmp = path + ".tmp.%d" % os.getpid()
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        elif self.protocol == "s3" and usermeta:
            # native usermeta (jsonutils.go:360-372): S3 object metadata
            # rides the same PutObject call — s3fs forwards extra
            # pipe_file kwargs to put_object, so no sidecar is needed
            self.fs.pipe_file(
                path, data, Metadata={k: str(v) for k, v in usermeta.items()}
            )
            return True
        else:
            with self.fs.open(path, "wb") as f:
                f.write(data)
        if usermeta:
            with self.fs.open(path + ".meta.json", "wb") as f:
                f.write(json.dumps(usermeta, sort_keys=True).encode("utf-8"))
        return True

    def get_text(self, object_name: str) -> str:
        with self.fs.open(self._path(object_name), "rb") as f:
            return f.read().decode("utf-8")

    def list_objects(self, prefix: str = "") -> list[str]:
        root = self._path(prefix).rstrip("/")
        if not self.fs.exists(root):
            return []
        found = self.fs.find(root)
        base = self.base if self.protocol != "memory" else self.base.lstrip("/")
        out = []
        for p in found:
            rel = p.split(base, 1)[-1].lstrip("/")
            if rel and not rel.endswith(".meta.json"):
                out.append(rel)
        return sorted(out)
