"""Snapshot repository — the blob-store repository surface
(``repositories/blobstore/BlobStoreRepository.java``,
``modules/repository-*``, coordinator ``SnapshotsService``):
point-in-time copies of an index into a repository directory,
listable, restorable, and INCREMENTAL — like the reference, repeated
snapshots of an index share unchanged segment files instead of
re-copying them.

Layout::

    repo/blobs/<sha256>        content-addressed file store (shared)
    repo/<name>/snapshot.json  manifest: relpath -> {hash, size}
    repo/.mounts/<name>/       hardlink views for searchable mounts

A snapshot is complete iff its manifest dir exists (atomic rename; a
killed snapshot leaves an invisible ``.tmp`` and possibly orphan blobs,
which the next delete's GC sweeps). Deleting a snapshot removes its
manifest then garbage-collects blobs no remaining snapshot references
(the reference's incremental-delete bookkeeping).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

_RESERVED = {"blobs"}


def _snap_dir(repo_dir: str, name: str) -> str:
    if (not name or name.endswith(".tmp") or os.sep in name
            or (os.altsep and os.altsep in name) or ".." in name
            or name in _RESERVED or name.startswith(".")):
        raise ValueError(f"invalid snapshot name {name!r}")
    return os.path.join(repo_dir, name)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def snapshot_create(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot the index into the repository. Incremental: files whose
    content already lives in the blob store are NOT copied again.
    Refuses to overwrite an existing snapshot (snapshots are
    immutable)."""
    dst = _snap_dir(repo_dir, name)
    if os.path.exists(dst):
        raise ValueError(f"snapshot {name!r} already exists")
    blobs = os.path.join(repo_dir, "blobs")
    os.makedirs(blobs, exist_ok=True)
    file_map: dict[str, dict] = {}
    total = 0
    reused = 0
    for root, _dirs, files in os.walk(index_dir):
        for f in sorted(files):
            path = os.path.join(root, f)
            rel = os.path.relpath(path, index_dir)
            digest = _sha256(path)
            size = os.path.getsize(path)
            blob = os.path.join(blobs, digest)
            if os.path.exists(blob):
                reused += 1
            else:
                tmp = blob + f".tmp-{os.getpid()}"
                _link_or_copy(path, tmp)
                os.replace(tmp, blob)
            file_map[rel] = {"hash": digest, "size": size}
            total += size
    manifest = {"snapshot": name, "source": os.path.abspath(index_dir),
                "files": len(file_map), "bytes": total,
                "reused_files": reused,
                "created_unix": int(time.time()),
                "file_map": file_map}
    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "snapshot.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, dst)  # atomic completion marker
    return manifest


def _manifest(repo_dir: str, name: str) -> dict:
    mpath = os.path.join(_snap_dir(repo_dir, name), "snapshot.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"no complete snapshot {name!r} in "
                                f"{repo_dir}")
    with open(mpath) as f:
        return json.load(f)


def snapshot_list(repo_dir: str) -> list[dict]:
    """Manifests of every COMPLETE snapshot in the repository (``.tmp``
    leftovers from killed runs are invisible)."""
    out = []
    if not os.path.isdir(repo_dir):
        return out
    for d in sorted(os.listdir(repo_dir)):
        mpath = os.path.join(repo_dir, d, "snapshot.json")
        if not d.endswith(".tmp") and os.path.exists(mpath):
            with open(mpath) as f:
                out.append(json.load(f))
    return out


def _materialize(repo_dir: str, name: str, dst_dir: str,
                 keep_manifest: bool = False) -> dict:
    man = _manifest(repo_dir, name)
    blobs = os.path.join(repo_dir, "blobs")
    tmp = dst_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    for rel, info in man["file_map"].items():
        out = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        _link_or_copy(os.path.join(blobs, info["hash"]), out)
    os.makedirs(tmp, exist_ok=True)  # empty index edge case
    os.replace(tmp, dst_dir)
    return man


def snapshot_restore(repo_dir: str, name: str, dst_index_dir: str) -> dict:
    """Restore a snapshot into ``dst_index_dir`` (must not exist —
    restores are whole-index, like RestoreService on a fresh index).
    Files hardlink out of the blob store when possible."""
    if os.path.exists(dst_index_dir):
        raise ValueError(f"restore target {dst_index_dir!r} already exists")
    return _materialize(repo_dir, name, dst_index_dir)


def snapshot_delete(repo_dir: str, name: str) -> None:
    """Remove the snapshot, then garbage-collect blobs no remaining
    snapshot references."""
    _manifest(repo_dir, name)  # raises if absent/incomplete
    shutil.rmtree(_snap_dir(repo_dir, name))
    shutil.rmtree(os.path.join(repo_dir, ".mounts", name),
                  ignore_errors=True)
    live = set()
    for man in snapshot_list(repo_dir):
        live.update(info["hash"] for info in man["file_map"].values())
    blobs = os.path.join(repo_dir, "blobs")
    if os.path.isdir(blobs):
        for b in os.listdir(blobs):
            if b.split(".tmp-")[0] not in live:
                os.remove(os.path.join(blobs, b))


def mount_snapshot(repo_dir: str, name: str, dtype: str = "float64"):
    """Searchable snapshot (x-pack searchable-snapshots
    ``TransportMountSearchableSnapshotAction.java``): open a QueryEngine
    over a HARDLINK VIEW of the snapshot's blobs — no data copy.
    Snapshots are immutable, so the mount is read-only by
    construction."""
    view = os.path.join(repo_dir, ".mounts", name)
    if not os.path.exists(view):
        os.makedirs(os.path.dirname(view), exist_ok=True)
        _materialize(repo_dir, name, view)
    if not os.path.exists(os.path.join(view, "index_meta.json")):
        raise FileNotFoundError(f"snapshot {name!r} holds no index")
    from elasticsearch_ray.search.engine import QueryEngine

    return QueryEngine(view, dtype=dtype)
