"""Snapshot repository — the fs-repository surface
(``modules/repository-*``, ``RepositoryPlugin.java``; coordinator
``SnapshotsService``): point-in-time copies of an index into a repository
directory, listable and restorable. Segments are immutable directory trees,
so a snapshot is a recursive copy finalized by an ATOMIC rename — a killed
snapshot leaves only an invisible ``.tmp`` dir, and a snapshot is readable
iff its manifest exists (same completion-marker discipline as the build)."""

from __future__ import annotations

import json
import os
import shutil
import time


def _snap_dir(repo_dir: str, name: str) -> str:
    if (not name or name.endswith(".tmp") or os.sep in name
            or (os.altsep and os.altsep in name) or ".." in name):
        raise ValueError(f"invalid snapshot name {name!r}")
    return os.path.join(repo_dir, name)


def snapshot_create(index_dir: str, repo_dir: str, name: str) -> dict:
    """Copy the whole index into ``repo_dir/name``. Refuses to overwrite an
    existing snapshot (snapshots are immutable, like the reference's)."""
    dst = _snap_dir(repo_dir, name)
    if os.path.exists(dst):
        raise ValueError(f"snapshot {name!r} already exists")
    os.makedirs(repo_dir, exist_ok=True)
    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(index_dir, tmp)
    n_files = sum(len(fs) for _, _, fs in os.walk(tmp))
    total = sum(os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(tmp) for f in fs)
    manifest = {"snapshot": name, "source": os.path.abspath(index_dir),
                "files": n_files, "bytes": total,
                "created_unix": int(time.time())}
    with open(os.path.join(tmp, "snapshot.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, dst)  # atomic completion marker
    return manifest


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


def snapshot_restore(repo_dir: str, name: str, dst_index_dir: str) -> dict:
    """Restore a snapshot into ``dst_index_dir`` (must not exist — restores
    are whole-index, like RestoreService on a fresh index)."""
    src = _snap_dir(repo_dir, name)
    if not os.path.exists(os.path.join(src, "snapshot.json")):
        raise FileNotFoundError(f"no complete snapshot {name!r} in {repo_dir}")
    if os.path.exists(dst_index_dir):
        raise ValueError(f"restore target {dst_index_dir!r} already exists")
    tmp = dst_index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    os.remove(os.path.join(tmp, "snapshot.json"))
    os.replace(tmp, dst_index_dir)
    with open(os.path.join(src, "snapshot.json")) as f:
        return json.load(f)


def snapshot_delete(repo_dir: str, name: str) -> None:
    shutil.rmtree(_snap_dir(repo_dir, name))


def mount_snapshot(repo_dir: str, name: str, dtype: str = "float64"):
    """Searchable snapshot (x-pack searchable-snapshots
    ``TransportMountSearchableSnapshotAction.java``): open a QueryEngine
    DIRECTLY over the snapshot files — no restore copy. Snapshots are
    immutable, so the mount is read-only by construction; the extra
    ``snapshot.json`` manifest is ignored by the reader (unknown files
    are, like Lucene ignores non-segment files)."""
    src = _snap_dir(repo_dir, name)
    if not os.path.exists(os.path.join(src, "snapshot.json")):
        raise FileNotFoundError(f"no complete snapshot {name!r} in {repo_dir}")
    from elasticsearch_ray.search.engine import QueryEngine

    return QueryEngine(src, dtype=dtype)
