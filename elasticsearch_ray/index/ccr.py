"""CCR analog — cross-cluster replication follower indices
(``x-pack/plugin/ccr``: ``TransportPutFollowAction.java``,
``ShardFollowNodeTask.java``, ``TransportResumeFollowAction.java``).

The reference follower bootstraps from a snapshot-like restore of the
leader then tails per-shard operation batches. Our indexes are
immutable segment partitions with manifests, so following is
SEGMENT-level (the shape of the reference's initial `restore from
remote` plus file-based recovery on changes):

- ``follow(leader, follower)`` — initial sync: copy every partition +
  index meta, write ``follow.json`` recording the leader;
- ``poll_follow(follower)`` — incremental sync: a partition is copied
  only when the follower lacks it or its ``manifest.json`` bytes
  changed (manifests carry format/spec/input fingerprints, so any
  rebuild/merge/append changes them); partitions gone from the leader
  (tiered merges rewrite groups) are dropped. Untouched partitions are
  never re-copied. Copies land under a ``.tmp`` and rename in, so a
  killed sync never leaves a half-written partition visible.

Followers are read-only (the reference blocks writes on followers):
``follow.json``'s presence marks the index as a follower, and
``assert_not_follower`` lets write paths refuse.
"""

from __future__ import annotations

import json
import os
import shutil

FOLLOW_MARKER = "follow.json"


class FollowerError(ValueError):
    pass


def _parts(index_dir: str) -> dict[str, str]:
    """{part dirname: abs path} of complete partitions."""
    root = os.path.join(index_dir, "parts")
    out = {}
    if os.path.isdir(root):
        for d in sorted(os.listdir(root)):
            p = os.path.join(root, d)
            if (d.startswith("part=") and not d.endswith(".tmp")
                    and os.path.exists(os.path.join(p, "manifest.json"))):
                out[d] = p
    return out


def _manifest_bytes(part_dir: str) -> bytes:
    with open(os.path.join(part_dir, "manifest.json"), "rb") as f:
        return f.read()


def is_follower(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, FOLLOW_MARKER))


def assert_not_follower(index_dir: str) -> None:
    if is_follower(index_dir):
        raise FollowerError(
            f"{index_dir} is a CCR follower (read-only); writes must go "
            f"to the leader")


def _copy_part(src: str, dst: str) -> None:
    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    shutil.rmtree(dst, ignore_errors=True)
    os.replace(tmp, dst)


def poll_follow(follower_dir: str) -> dict:
    """Sync the follower from its leader. Returns
    ``{"copied": [...], "removed": [...], "unchanged": [...]}``."""
    marker = os.path.join(follower_dir, FOLLOW_MARKER)
    if not os.path.exists(marker):
        raise FollowerError(f"{follower_dir} is not a follower")
    with open(marker) as f:
        leader_dir = json.load(f)["leader"]
    if not os.path.exists(os.path.join(leader_dir, "index_meta.json")):
        raise FollowerError(f"leader {leader_dir!r} has no index")

    leader_parts = _parts(leader_dir)
    follower_parts = _parts(follower_dir)
    copied, removed, unchanged = [], [], []
    os.makedirs(os.path.join(follower_dir, "parts"), exist_ok=True)
    for name, src in leader_parts.items():
        dst = os.path.join(follower_dir, "parts", name)
        if name in follower_parts and \
                _manifest_bytes(src) == _manifest_bytes(dst):
            unchanged.append(name)
            continue
        _copy_part(src, dst)
        copied.append(name)
    for name in follower_parts:
        if name not in leader_parts:
            shutil.rmtree(os.path.join(follower_dir, "parts", name))
            removed.append(name)
    # meta last: readers opened against the new meta see complete parts
    shutil.copy2(os.path.join(leader_dir, "index_meta.json"),
                 os.path.join(follower_dir, "index_meta.json"))
    return {"copied": copied, "removed": removed, "unchanged": unchanged}


def follow(leader_dir: str, follower_dir: str) -> dict:
    """Create a follower of ``leader_dir`` at ``follower_dir`` (must not
    already be an index) and run the initial sync."""
    if not os.path.exists(os.path.join(leader_dir, "index_meta.json")):
        raise FollowerError(f"leader {leader_dir!r} has no index")
    if os.path.exists(os.path.join(follower_dir, "index_meta.json")):
        raise FollowerError(f"{follower_dir!r} already holds an index")
    if is_follower(leader_dir):
        raise FollowerError("cannot follow a follower (the reference "
                            "requires the leader index to be a leader)")
    os.makedirs(follower_dir, exist_ok=True)
    with open(os.path.join(follower_dir, FOLLOW_MARKER), "w") as f:
        json.dump({"leader": os.path.abspath(leader_dir)}, f)
    return poll_follow(follower_dir)


def unfollow(follower_dir: str) -> None:
    """Promote the follower to a regular index (the reference's
    pause+close+unfollow flow ends the same way)."""
    marker = os.path.join(follower_dir, FOLLOW_MARKER)
    if not os.path.exists(marker):
        raise FollowerError(f"{follower_dir} is not a follower")
    os.remove(marker)
