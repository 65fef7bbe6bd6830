"""Object-store seam for the pipeline (reference: S3 via boto3).

The reference reads and writes S3 objects (download_lambda.py:10,51-56,
83-84,133-138). The rebuild keeps the same four-argument ``put_object`` /
``get_object`` surface so the handler logic and the reference's test
doubles port 1:1, but the default implementation is a local directory
tree — on a real cluster the same paths work as ``s3a://`` URIs through
Hadoop's filesystem layer, which is the idiomatic Spark way to talk to
S3 (no boto3 in executors).
"""

from __future__ import annotations

import os


class LocalObjectStore:
    """Bucket = directory under ``root``; key = file name inside it."""

    def __init__(self, root: str = ".") -> None:
        self.root = root

    def _path(self, bucket: str, key: str) -> str:
        return os.path.join(self.root, bucket, key)

    def put_object(self, Bucket: str, Key: str, Body: str | bytes, ContentType: str = "") -> dict:
        path = self._path(Bucket, Key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = Body.encode("utf-8") if isinstance(Body, str) else Body
        with open(path, "wb") as f:
            f.write(data)
        return {"ResponseMetadata": {"HTTPStatusCode": 200}}

    def get_object(self, Bucket: str, Key: str) -> dict:
        with open(self._path(Bucket, Key), "rb") as f:
            data = f.read()

        class _Body:
            def read(self) -> bytes:
                return data

        return {"Body": _Body()}
