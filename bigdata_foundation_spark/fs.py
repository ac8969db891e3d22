"""Archive filesystem seam (r13 verdict task 4).

The byte-range archive readers/writers (``io.read_warc_gz``,
``io.read_warc_gz_indexed``, ``io.build_warc_cdx``,
``io.write_warc_gz``) do raw file I/O from EXECUTOR tasks — seeks,
ranged reads, temp-write-then-rename. On POSIX that is ``open`` /
``os``; an object-store deployment maps the same five primitives onto
ranged GETs and conditional PUTs. This module is the seam: the io
functions take an ``fs`` argument (default :class:`PosixArchiveFS`)
and do ALL their file I/O through it, mirroring the snapshot layer's
log-store seam (``io.PosixSnapshotLogStore``).

Requirements on an implementation:

- it must be PICKLABLE — the object is captured in task closures and
  shipped to executors (keep it a thin, stateless client: endpoint +
  credentials reference, not an open connection);
- ``open(path, "rb")`` must return a file-like supporting ``read``,
  ``seek``, ``tell``, ``close`` (ranged reads: the readers seek to a
  member offset and read a bounded slice — on object stores implement
  with ranged GETs, never a whole-object download);
- ``open(path, "wb")`` + ``replace`` must make a completed write
  visible under its final name atomically enough that a reader never
  sees a torn file (temp name + server-side rename/copy);
- writes from executors must be visible to the driver and to later
  readers (shared storage — an in-memory fs is read-only in practice:
  executor copies are process-local, see :class:`MemArchiveFS`).

``check_archive_fs`` is the executable contract, same pattern as
``io.check_log_store``.
"""

from __future__ import annotations

import io as _io


class PosixArchiveFS:
    """Default backend: the local/shared-POSIX filesystem."""

    def open(self, path: str, mode: str = "rb"):
        return open(path, mode)

    def size(self, path: str) -> int:
        import os

        return os.path.getsize(path)

    def exists(self, path: str) -> bool:
        import os

        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        import os

        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        import os

        return os.listdir(path)

    def makedirs(self, path: str) -> None:
        import os

        os.makedirs(path, exist_ok=True)

    def replace(self, src: str, dst: str) -> None:
        import os

        os.replace(src, dst)

    def glob(self, pattern: str) -> list[str]:
        import glob as _glob

        return sorted(_glob.glob(pattern))


class PrefixArchiveFS(PosixArchiveFS):
    """POSIX-backed fs that only accepts paths under a fake scheme
    (``<scheme>://rel/path``), remapping them below ``root``. Used by
    the contract tests to PROVE the io functions route every byte
    through the seam: the fake-scheme paths do not exist as POSIX
    paths, so any code path that bypasses ``fs`` fails loudly instead
    of silently reading the wrong bytes. Stateless (scheme + root
    strings), so executor pickles share the same backing directory —
    unlike :class:`MemArchiveFS`, WRITES through it are shared."""

    def __init__(self, scheme: str, root: str):
        self.scheme = scheme
        self.root = root

    def _map(self, path: str) -> str:
        import os

        prefix = f"{self.scheme}://"
        if not path.startswith(prefix):
            raise ValueError(
                f"PrefixArchiveFS({self.scheme!r}): path {path!r} lacks "
                "the scheme — a raw POSIX path reaching the fs means "
                "some caller bypassed the seam"
            )
        return os.path.join(self.root, path[len(prefix):])

    def open(self, path: str, mode: str = "rb"):
        return open(self._map(path), mode)

    def size(self, path: str) -> int:
        import os

        return os.path.getsize(self._map(path))

    def exists(self, path: str) -> bool:
        import os

        return os.path.exists(self._map(path))

    def isdir(self, path: str) -> bool:
        import os

        return os.path.isdir(self._map(path))

    def listdir(self, path: str) -> list[str]:
        import os

        return os.listdir(self._map(path))

    def makedirs(self, path: str) -> None:
        import os

        os.makedirs(self._map(path), exist_ok=True)

    def replace(self, src: str, dst: str) -> None:
        import os

        os.replace(self._map(src), self._map(dst))

    def glob(self, pattern: str) -> list[str]:
        import glob as _glob
        import os

        prefix = f"{self.scheme}://"
        hits = sorted(_glob.glob(self._map(pattern)))
        return [prefix + os.path.relpath(h, self.root) for h in hits]


class MemArchiveFS:
    """In-memory fs for READ-path tests: a dict of path → bytes that
    pickles WITH its contents, so executor tasks can seek/read
    archives that exist nowhere on disk (proving the pure-read path
    needs no POSIX at all). Writes mutate only the local process's
    copy — fine on the driver, silently lost from executors — so the
    write-path contract tests use :class:`PrefixArchiveFS` instead."""

    def __init__(self, files: dict[str, bytes] | None = None):
        self.files = dict(files or {})

    def open(self, path: str, mode: str = "rb"):
        if mode == "rb":
            try:
                return _io.BytesIO(self.files[path])
            except KeyError:
                raise FileNotFoundError(path)
        if mode == "wb":
            fs = self

            class _W(_io.BytesIO):
                def close(self_w):
                    fs.files[path] = self_w.getvalue()
                    _io.BytesIO.close(self_w)

            return _W()
        raise ValueError(f"mode {mode!r} not supported")

    def size(self, path: str) -> int:
        try:
            return len(self.files[path])
        except KeyError:
            raise FileNotFoundError(path)

    def exists(self, path: str) -> bool:
        return path in self.files or self.isdir(path)

    def isdir(self, path: str) -> bool:
        d = path.rstrip("/") + "/"
        return any(f.startswith(d) for f in self.files)

    def listdir(self, path: str) -> list[str]:
        d = path.rstrip("/") + "/"
        return sorted({f[len(d):].split("/")[0] for f in self.files if f.startswith(d)})

    def makedirs(self, path: str) -> None:
        pass  # directories are implicit

    def replace(self, src: str, dst: str) -> None:
        try:
            self.files[dst] = self.files.pop(src)
        except KeyError:
            # same exception family as the POSIX backend (contract:
            # callers handle missing paths uniformly across backends)
            raise FileNotFoundError(src)

    def glob(self, pattern: str) -> list[str]:
        # Segment-wise match: '*' must not cross '/' (POSIX glob
        # semantics) or fs-parameterized code sees different file sets
        # per backend — 'dir/*.gz' must NOT match 'dir/sub/x.gz'
        # (r14 advice; check_archive_fs pins this on every backend).
        import fnmatch

        pseg = pattern.split("/")

        def _match(path: str) -> bool:
            seg = path.split("/")
            return len(seg) == len(pseg) and all(
                fnmatch.fnmatch(s, p) for s, p in zip(seg, pseg)
            )

        return sorted(f for f in self.files if _match(f))


def check_archive_fs(fs, scratch_dir: str) -> None:
    """Executable contract for an archive-fs backend, against the
    storage it targets; raises ValueError naming the first violation.
    ``scratch_dir`` is a path IN THE BACKEND'S NAMESPACE (e.g.
    ``s3://bucket/probe`` for an object-store client)."""
    sep = "" if scratch_dir.endswith("/") else "/"
    base = scratch_dir + sep
    fs.makedirs(scratch_dir)
    p = base + "probe.bin"
    payload = bytes(range(256)) * 64  # 16 KiB

    with fs.open(p + ".tmp", "wb") as fh:
        fh.write(payload)
    fs.replace(p + ".tmp", p)
    if fs.exists(p + ".tmp"):
        raise ValueError("archive fs: replace left the temp name behind")
    if not fs.exists(p):
        raise ValueError("archive fs: replaced file does not exist")
    if fs.size(p) != len(payload):
        raise ValueError("archive fs: size mismatch after write+replace")

    with fs.open(p, "rb") as fh:
        if fh.read() != payload:
            raise ValueError("archive fs: full read corrupt")
        # ranged read: seek + bounded read, the splittable readers'
        # access pattern
        fh.seek(1000)
        if fh.tell() != 1000:
            raise ValueError("archive fs: tell after seek is wrong")
        if fh.read(500) != payload[1000:1500]:
            raise ValueError("archive fs: ranged read corrupt")
        fh.seek(len(payload) - 3)
        if fh.read(100) != payload[-3:]:
            raise ValueError("archive fs: tail read past EOF corrupt")

    if "probe.bin" not in fs.listdir(scratch_dir):
        raise ValueError("archive fs: listdir misses the written file")
    if not fs.isdir(scratch_dir):
        raise ValueError("archive fs: isdir(scratch) is false")
    if fs.isdir(p):
        raise ValueError("archive fs: isdir(file) is true")
    got = fs.glob(base + "*.bin")
    if got != [p]:
        raise ValueError(f"archive fs: glob returned {got!r}, want [{p!r}]")
    # '*' must not cross '/' — a nested file may not match a
    # single-level pattern (backends must agree on glob scope)
    fs.makedirs(base + "sub")
    nested = base + "sub/nested.bin"
    with fs.open(nested + ".tmp", "wb") as fh:
        fh.write(b"x")
    fs.replace(nested + ".tmp", nested)
    got = fs.glob(base + "*.bin")
    if got != [p]:
        raise ValueError(
            f"archive fs: glob {base + '*.bin'!r} returned {got!r} — "
            "'*' crossed a '/' separator (must match one segment only)"
        )
    if fs.glob(base + "sub/*.bin") != [nested]:
        raise ValueError("archive fs: segment-scoped glob missed the nested file")
    if fs.exists(base + "nope.bin"):
        raise ValueError("archive fs: exists() true for a missing file")
    try:
        fs.open(base + "nope.bin", "rb")
    except (FileNotFoundError, OSError):
        pass
    else:
        raise ValueError("archive fs: open of a missing file did not raise")
