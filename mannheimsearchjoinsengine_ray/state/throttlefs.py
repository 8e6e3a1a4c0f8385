"""Rate-limited filesystem — the synthetic slow-storage harness.

Wraps :class:`pyarrow.fs.LocalFileSystem` in a :class:`PyFileSystem` handler
that throttles every data stream to ``rate_bytes_per_sec`` (per stream — the
per-connection bandwidth regime of remote object stores) and charges
``op_latency_s`` on each open/metadata operation (the per-request RTT that
punishes many-small-files layouts).  Purpose: make I/O-bound behavior
REPRODUCIBLE on a box whose local disk + page cache hide it, so policies
like run-file compression (``materialize_triples``; BASELINE.md #37/#42)
can be A/B-measured decisively instead of inferred from co-tenant noise.

Everything routes through the ``state/fsio.py`` indirection, so any stage
that takes ``fs=`` runs against this unchanged.  The handler pickles by
construction args (stream state is never shipped), so Ray task closures can
carry the fs like any other pyarrow filesystem.

Local sleeps model only bandwidth/latency, not contention — good enough to
rank policies whose byte volumes differ 3×, not to predict absolute cluster
seconds.
"""

from __future__ import annotations

import time

import pyarrow as pa
from pyarrow.fs import FileSystemHandler, LocalFileSystem, PyFileSystem


class _ThrottledFile:
    """File-like wrapper: sleeps len/rate on every read/write."""

    def __init__(self, fh, rate: float):
        self._fh = fh
        self._rate = rate

    def _pay(self, nbytes: int) -> None:
        if self._rate > 0 and nbytes > 0:
            time.sleep(nbytes / self._rate)

    def read(self, nbytes=None):
        data = self._fh.read() if nbytes is None else self._fh.read(nbytes)
        self._pay(len(data))
        return data

    def write(self, data):
        self._pay(len(data))
        return self._fh.write(data)

    def seek(self, offset, whence=0):
        return self._fh.seek(offset, whence)

    def tell(self):
        return self._fh.tell()

    def flush(self):
        self._fh.flush()

    def close(self):
        self._fh.close()

    @property
    def closed(self):
        return self._fh.closed

    def readable(self):
        return self._fh.readable()

    def writable(self):
        return self._fh.writable()

    def seekable(self):
        return self._fh.seekable()


class ThrottledFSHandler(FileSystemHandler):
    def __init__(self, rate_bytes_per_sec: float = 50e6,
                 op_latency_s: float = 0.0):
        self.rate = float(rate_bytes_per_sec)
        self.latency = float(op_latency_s)
        self._local = LocalFileSystem()

    # -- pickling: construction args only (streams never ship) --
    def __reduce__(self):
        return (ThrottledFSHandler, (self.rate, self.latency))

    def _tick(self) -> None:
        if self.latency > 0:
            time.sleep(self.latency)

    # -- identity / paths --
    def get_type_name(self):
        return f"throttled({self.rate:.0f}B/s,{self.latency}s)"

    def __eq__(self, other):
        return (isinstance(other, ThrottledFSHandler)
                and other.rate == self.rate and other.latency == self.latency)

    def __ne__(self, other):
        return not self.__eq__(other)

    def normalize_path(self, path):
        return self._local.normalize_path(path)

    # -- metadata ops: delegate + latency --
    def get_file_info(self, paths):
        self._tick()
        return self._local.get_file_info(paths)

    def get_file_info_selector(self, selector):
        self._tick()
        return self._local.get_file_info(selector)

    def create_dir(self, path, recursive):
        self._tick()
        self._local.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self._tick()
        self._local.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._tick()
        self._local.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        raise NotImplementedError("refusing to clear '/'")

    def delete_file(self, path):
        self._tick()
        self._local.delete_file(path)

    def move(self, src, dest):
        self._tick()
        self._local.move(src, dest)

    def copy_file(self, src, dest):
        self._tick()
        self._local.copy_file(src, dest)

    # -- data streams: wrap + throttle --
    def open_input_stream(self, path):
        self._tick()
        return pa.PythonFile(
            _ThrottledFile(open(path, "rb"), self.rate), mode="r")

    def open_input_file(self, path):
        self._tick()
        return pa.PythonFile(
            _ThrottledFile(open(path, "rb"), self.rate), mode="r")

    def open_output_stream(self, path, metadata):
        self._tick()
        return pa.PythonFile(
            _ThrottledFile(open(path, "wb"), self.rate), mode="w")

    def open_append_stream(self, path, metadata):
        self._tick()
        return pa.PythonFile(
            _ThrottledFile(open(path, "ab"), self.rate), mode="w")


def throttled_local_fs(rate_bytes_per_sec: float = 50e6,
                       op_latency_s: float = 0.0) -> PyFileSystem:
    """A picklable slow-storage stand-in over the local filesystem."""
    return PyFileSystem(ThrottledFSHandler(rate_bytes_per_sec, op_latency_s))
