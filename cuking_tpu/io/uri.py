"""Storage abstraction: local paths and gs:// URIs through one interface.

The reference talks to GCS directly via the google-cloud-cpp client with a
connection pool sized to the reader thread count and requester-pays support
(cuking.cu:340-353, 470-477, 554-555).  Here, local filesystem access is
native and ``gs://`` goes through fsspec/gcsfs when installed (same Arrow
C++ decode path either way); requester-pays maps to gcsfs'
``requester_pays``/``project`` options.
"""

from __future__ import annotations

import os
import posixpath
from dataclasses import dataclass, field

from cuking_tpu.utils.status import FailedPreconditionError, InvalidArgumentError


def is_gcs_uri(uri: str) -> bool:
    return uri.startswith("gs://")


def split_gcs_uri(uri: str) -> tuple[str, str]:
    """gs://bucket/path → (bucket, path); mirrors SplitGcsUri validation
    (cuking.cu:340-353)."""
    if not uri.startswith("gs://"):
        raise InvalidArgumentError(f"Unsupported URI: {uri}")
    rest = uri[len("gs://") :]
    slash = rest.find("/")
    if slash < 0:
        raise InvalidArgumentError(f"Incomplete blob URI {rest}")
    return rest[:slash], rest[slash + 1 :]


@dataclass
class Storage:
    """Thin filesystem wrapper; one instance per run."""

    requester_pays_project: str = ""
    _gcs_fs: object = field(default=None, repr=False)

    def _fs_for(self, uri: str):
        if not is_gcs_uri(uri):
            return None
        if self._gcs_fs is None:
            try:
                import gcsfs  # noqa: F401
                import fsspec
            except ImportError as e:
                raise FailedPreconditionError(
                    f"gs:// URIs require gcsfs, which is not installed: {e}"
                )
            opts = {}
            if self.requester_pays_project:
                opts["requester_pays"] = True
                opts["project"] = self.requester_pays_project
            self._gcs_fs = fsspec.filesystem("gs", **opts)
        return self._gcs_fs

    def list_parquet_files(self, input_uri: str) -> list[str]:
        """Non-recursive listing of ``*.parquet`` directly under the input
        directory — skipping subdirectories mirrors the reference's
        ``Delimiter("/")`` listing that avoids Spark ``_temporary`` dirs
        (cuking.cu:530-540)."""
        fs = self._fs_for(input_uri)
        if fs is None:
            if not os.path.isdir(input_uri):
                raise FailedPreconditionError(
                    f"Input directory not found: {input_uri}"
                )
            names = sorted(os.listdir(input_uri))
            return [
                os.path.join(input_uri, n)
                for n in names
                if n.endswith(".parquet")
                and os.path.isfile(os.path.join(input_uri, n))
            ]
        bucket, path = split_gcs_uri(input_uri)
        entries = fs.ls(f"{bucket}/{path}", detail=True)
        return sorted(
            "gs://" + e["name"]
            for e in entries
            if e.get("type") == "file" and e["name"].endswith(".parquet")
        )

    def open_read(self, uri: str):
        fs = self._fs_for(uri)
        if fs is None:
            return open(uri, "rb")
        bucket, path = split_gcs_uri(uri)
        return fs.open(f"{bucket}/{path}", "rb")

    def open_write(self, uri: str):
        fs = self._fs_for(uri)
        if fs is None:
            os.makedirs(os.path.dirname(uri) or ".", exist_ok=True)
            return open(uri, "wb")
        bucket, path = split_gcs_uri(uri)
        return fs.open(f"{bucket}/{path}", "wb")

    def exists(self, uri: str) -> bool:
        fs = self._fs_for(uri)
        if fs is None:
            return os.path.exists(uri)
        bucket, path = split_gcs_uri(uri)
        return fs.exists(f"{bucket}/{path}")

    def join(self, base: str, *parts: str) -> str:
        if is_gcs_uri(base):
            return posixpath.join(base, *parts)
        return os.path.join(base, *parts)

    def read_bytes(self, uri: str) -> bytes:
        """Whole-object read, like the reference's read-into-memory strategy
        that avoids ranged-request roundtrips (cuking.cu:563-572)."""
        with self.open_read(uri) as f:
            return f.read()
