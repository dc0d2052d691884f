"""Client-side encrypted snapshot repository — the
``x-pack/plugin/repository-encrypted`` analog
(``EncryptedRepository.java``, ``EncryptionPacketsInputStream.java``,
``DecryptionPacketsInputStream.java``, ``AESKeyUtils.java``) on top of
the content-addressed blob repository in ``index/snapshot.py``.

Scheme (all constants fixed by the reference — changing them breaks
compatibility, ``EncryptedRepository.java:70-84``):

- Every data blob is encrypted with a **DEK** (a random 256-bit AES
  key). The DEK's 22-char id is PREPENDED to the encrypted blob
  (``DEK_ID_LENGTH = 22``), so each blob self-describes which DEK
  decrypts it.
- Blobs are encrypted **packet-wise** in 64 KiB packets
  (``PACKET_LENGTH_IN_BYTES``), AES-256-GCM per packet. Each packet is
  ``IV(12) || ciphertext || tag(16)``; the IV is a 4-byte per-blob
  nonce followed by an 8-byte big-endian packet counter starting at
  ``PACKET_START_COUNTER = Long.MIN_VALUE``
  (``EncryptionPacketsInputStream.java:40-45,105-109``) so packets
  cannot be reordered or truncated without breaking authentication
  (the last packet may be empty and still carries a tag).
- The DEK itself is stored AES-wrapped (RFC 3394) under
  ``.encryption-metadata/<dek_id>/<kek_id>`` where the **KEK** is
  PBKDF2-HMAC-SHA512(password, salt=dek_id, 61616 iters) and
  ``kek_id`` is the deterministic key id (AES-wrap of a fixed
  32-byte plaintext, base64url) — ``EncryptedRepository.java:306-326``,
  ``AESKeyUtils.java``. Decryption re-derives the KEK from the
  password + the blob's dek_id; a wrong password fails the RFC 3394
  integrity check (and never touches the data blobs).

Snapshot layout (delegated store = the plain fs repository of
``snapshot.py``, with encrypted file contents)::

    repo/blobs/<sha256-of-PLAINTEXT>   encrypted packets stream
    repo/<name>/snapshot.enc           encrypted manifest blob
    repo/.encryption-metadata/<dek_id>/<kek_id>   wrapped DEK (40 B)

Blob names stay content-addressed by the PLAINTEXT hash, so the
incremental-snapshot property survives encryption: a file already in
the blob store is not re-encrypted or re-uploaded (the reference keeps
the delegated blob names and runs the same incrementality logic above
the encryption layer).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import shutil
import time

from elasticsearch_ray.index import crypto
from elasticsearch_ray.index.snapshot import _sha256, _snap_dir

# fixed by the reference (EncryptedRepository.java:70-84)
GCM_TAG_LEN = 16
GCM_IV_LEN = 12
PACKET_LENGTH = 64 * 1024
PACKET_START_COUNTER = -(1 << 63)  # Long.MIN_VALUE
DEK_ROOT_CONTAINER = ".encryption-metadata"
DEK_ID_LENGTH = 22
WRAPPED_KEY_LEN = 40  # 32-byte key + RFC 3394 8-byte integrity block


def get_encryption_length(plaintext_len: int,
                          packet_len: int = PACKET_LENGTH) -> int:
    """EncryptionPacketsInputStream.getEncryptionLength: the plaintext
    splits into full packets plus a final short (possibly EMPTY)
    packet, each prepended its IV and appended its tag."""
    n_packets = plaintext_len // packet_len + 1
    return plaintext_len + n_packets * (GCM_IV_LEN + GCM_TAG_LEN)


def get_encrypted_blob_length(plaintext_len: int) -> int:
    """EncryptedRepository.getEncryptedBlobByteLength (dek-id prefix +
    packet stream)."""
    return DEK_ID_LENGTH + get_encryption_length(plaintext_len)


def _pack_counter(counter: int) -> bytes:
    """8-byte big-endian two's-complement (Java ByteBuffer.putLong)."""
    return (counter & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "big")


def encrypt_packets(dek: bytes, nonce: int, plaintext: bytes,
                    packet_len: int = PACKET_LENGTH) -> bytes:
    """The EncryptionPacketsInputStream stream body (without the dek-id
    prefix): ``(IV || ct || tag)*`` with the monotonically increasing
    counter IV scheme."""
    out = []
    counter = PACKET_START_COUNTER
    n_packets = len(plaintext) // packet_len + 1
    nonce_b = (nonce & 0xFFFFFFFF).to_bytes(4, "big")
    for p in range(n_packets):
        chunk = plaintext[p * packet_len:(p + 1) * packet_len]
        iv = nonce_b + _pack_counter(counter)
        counter += 1
        ct, tag = crypto.aes_gcm_encrypt(dek, iv, chunk)
        out.append(iv + ct + tag)
    return b"".join(out)


def decrypt_packets(dek: bytes, data: bytes,
                    packet_len: int = PACKET_LENGTH) -> bytes:
    """DecryptionPacketsInputStream: verify every packet tag AND the
    IV discipline (same nonce, counters dense from
    PACKET_START_COUNTER) so packets cannot be reordered, replayed or
    dropped."""
    out = []
    off = 0
    expect_counter = PACKET_START_COUNTER
    nonce_b: bytes | None = None
    enc_packet = GCM_IV_LEN + packet_len + GCM_TAG_LEN
    while True:
        packet = data[off:off + enc_packet]
        if len(packet) < GCM_IV_LEN + GCM_TAG_LEN:
            raise ValueError("truncated encrypted packet stream")
        iv = packet[:GCM_IV_LEN]
        if nonce_b is None:
            nonce_b = iv[:4]
        elif iv[:4] != nonce_b:
            raise ValueError("packet nonce mismatch (stream spliced?)")
        counter = int.from_bytes(iv[4:], "big")
        if counter >= 1 << 63:
            counter -= 1 << 64
        if counter != expect_counter:
            raise ValueError("packet counter out of order")
        expect_counter += 1
        ct = packet[GCM_IV_LEN:-GCM_TAG_LEN]
        tag = packet[-GCM_TAG_LEN:]
        out.append(crypto.aes_gcm_decrypt(dek, iv, ct, tag))
        off += len(packet)
        if len(ct) < packet_len:  # the final (short or empty) packet
            break
    if off != len(data):
        raise ValueError("trailing bytes after final packet")
    return b"".join(out)


# ------------------------------------------------------------- DEK store

def _new_dek_id(seed: bytes) -> str:
    """22-char base64url id (UUIDs.randomBase64UUID shape). Derived
    from entropy the caller supplies (os.urandom) — only uniqueness
    matters, ids are public."""
    return base64.urlsafe_b64encode(seed[:16]).rstrip(b"=").decode()


def _store_dek(repo_dir: str, dek_id: str, dek: bytes,
               password: str) -> None:
    kek = crypto.password_based_key(password, dek_id.encode())
    kek_id = crypto.compute_key_id(kek)
    ddir = os.path.join(repo_dir, DEK_ROOT_CONTAINER, dek_id)
    os.makedirs(ddir, exist_ok=True)
    wrapped = crypto.aes_key_wrap(kek, dek)
    if len(wrapped) != WRAPPED_KEY_LEN:
        raise AssertionError("wrapped DEK has unexpected length")
    tmp = os.path.join(ddir, kek_id + f".tmp-{os.getpid()}")
    with open(tmp, "wb") as f:
        f.write(wrapped)
    os.replace(tmp, os.path.join(ddir, kek_id))


def _load_dek(repo_dir: str, dek_id: str, password: str) -> bytes:
    """EncryptedBlobStore.loadDEK: re-derive the KEK from (password,
    dek_id), locate the wrapped blob by kek_id, unwrap with integrity
    check."""
    kek = crypto.password_based_key(password, dek_id.encode())
    kek_id = crypto.compute_key_id(kek)
    path = os.path.join(repo_dir, DEK_ROOT_CONTAINER, dek_id, kek_id)
    if not os.path.exists(path):
        # reference: "repository password is incorrect" — the DEK was
        # wrapped under a KEK with a different id
        raise ValueError(
            f"no wrapped DEK [{dek_id}] for this password "
            "(repository password is incorrect?)")
    with open(path, "rb") as f:
        wrapped = f.read()
    if len(wrapped) != WRAPPED_KEY_LEN:
        raise ValueError(f"wrapped DEK [{dek_id}] has unexpected length")
    return crypto.aes_key_unwrap(kek, wrapped)


class _DekSession:
    """One DEK reused across the blobs of a snapshot operation (the
    reference's single-use-DEK supplier generates a fresh DEK per
    repository generation; per-blob uniqueness comes from the nonce).
    Nonces are a per-session counter, so (key, nonce) pairs never
    repeat within the DEK's lifetime."""

    def __init__(self, repo_dir: str, password: str):
        seed = os.urandom(32)
        self.dek = hashlib.sha256(seed + b"dek").digest()
        self.dek_id = _new_dek_id(hashlib.sha256(seed + b"id").digest())
        if len(self.dek_id) != DEK_ID_LENGTH:
            raise AssertionError("dek id length")
        self._nonce = 0
        _store_dek(repo_dir, self.dek_id, self.dek, password)

    def encrypt_blob(self, plaintext: bytes) -> bytes:
        nonce = self._nonce
        self._nonce += 1
        return (self.dek_id.encode()
                + encrypt_packets(self.dek, nonce, plaintext))


def decrypt_blob(repo_dir: str, data: bytes, password: str,
                 _dek_cache: dict | None = None) -> bytes:
    """Strip the dek-id prefix, resolve + unwrap the DEK (cached — the
    reference keeps a DEK_CACHE_WEIGHT=2048 LRU), decrypt packets."""
    dek_id = data[:DEK_ID_LENGTH].decode("ascii")
    if _dek_cache is not None and dek_id in _dek_cache:
        dek = _dek_cache[dek_id]
    else:
        dek = _load_dek(repo_dir, dek_id, password)
        if _dek_cache is not None:
            _dek_cache[dek_id] = dek
    return decrypt_packets(dek, data[DEK_ID_LENGTH:])


# ------------------------------------------------------- repository API

def encrypted_snapshot_create(index_dir: str, repo_dir: str, name: str,
                              password: str) -> dict:
    """Snapshot ``index_dir`` into an encrypted repository. Incremental
    by PLAINTEXT content hash; blob files hold the encrypted packet
    stream. The manifest itself is stored encrypted
    (``<name>/snapshot.enc``), so listing requires the password."""
    dst = _snap_dir(repo_dir, name)
    if os.path.exists(dst):
        raise ValueError(f"snapshot {name!r} already exists")
    blobs = os.path.join(repo_dir, "blobs")
    os.makedirs(blobs, exist_ok=True)
    session = _DekSession(repo_dir, password)
    file_map: dict[str, dict] = {}
    total = 0
    reused = 0
    for root, _dirs, files in os.walk(index_dir):
        if os.path.basename(root) == DEK_ROOT_CONTAINER:
            continue
        for f in sorted(files):
            path = os.path.join(root, f)
            rel = os.path.relpath(path, index_dir)
            digest = _sha256(path)
            size = os.path.getsize(path)
            blob = os.path.join(blobs, digest)
            if os.path.exists(blob):
                reused += 1
            else:
                with open(path, "rb") as fh:
                    enc = session.encrypt_blob(fh.read())
                if len(enc) != get_encrypted_blob_length(size):
                    raise AssertionError("encrypted length mismatch")
                tmp = blob + f".tmp-{os.getpid()}"
                with open(tmp, "wb") as fh:
                    fh.write(enc)
                os.replace(tmp, blob)
            file_map[rel] = {"hash": digest, "size": size}
            total += size
    manifest = {"snapshot": name, "source": os.path.abspath(index_dir),
                "encrypted": True, "dek_id": session.dek_id,
                "files": len(file_map), "bytes": total,
                "reused_files": reused,
                "created_unix": int(time.time()),
                "file_map": file_map}
    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    enc_manifest = session.encrypt_blob(
        json.dumps(manifest, indent=1).encode())
    with open(os.path.join(tmp, "snapshot.enc"), "wb") as f:
        f.write(enc_manifest)
    os.replace(tmp, dst)
    return manifest


def _read_manifest(repo_dir: str, name: str, password: str,
                   dek_cache: dict | None = None) -> dict:
    mpath = os.path.join(_snap_dir(repo_dir, name), "snapshot.enc")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no complete encrypted snapshot {name!r} in {repo_dir}")
    with open(mpath, "rb") as f:
        data = f.read()
    return json.loads(decrypt_blob(repo_dir, data, password, dek_cache))


def encrypted_snapshot_list(repo_dir: str, password: str) -> list[dict]:
    out = []
    if not os.path.isdir(repo_dir):
        return out
    cache: dict = {}
    for d in sorted(os.listdir(repo_dir)):
        if (d.endswith(".tmp") or d == "blobs"
                or d == DEK_ROOT_CONTAINER or d.startswith(".")):
            continue
        if os.path.exists(os.path.join(repo_dir, d, "snapshot.enc")):
            out.append(_read_manifest(repo_dir, d, password, cache))
    return out


def encrypted_snapshot_restore(repo_dir: str, name: str,
                               dst_index_dir: str, password: str) -> dict:
    """Decrypt + verify every blob into ``dst_index_dir`` (must not
    exist). Restored bytes are hash-verified against the manifest's
    plaintext digest — corruption or splicing fails loudly."""
    if os.path.exists(dst_index_dir):
        raise ValueError(f"restore target {dst_index_dir!r} already exists")
    man = _read_manifest(repo_dir, name, password)
    blobs = os.path.join(repo_dir, "blobs")
    cache: dict = {}
    tmp = dst_index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    for rel, info in man["file_map"].items():
        with open(os.path.join(blobs, info["hash"]), "rb") as f:
            enc = f.read()
        plain = decrypt_blob(repo_dir, enc, password, cache)
        if hashlib.sha256(plain).hexdigest() != info["hash"]:
            raise ValueError(f"restored blob {rel!r} hash mismatch")
        out = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "wb") as f:
            f.write(plain)
    os.makedirs(tmp, exist_ok=True)  # empty index edge case
    os.replace(tmp, dst_index_dir)
    return man


def encrypted_snapshot_delete(repo_dir: str, name: str,
                              password: str) -> None:
    """Remove the snapshot, GC unreferenced blobs AND orphaned wrapped
    DEKs (the reference's cleanupUnlinkedRootAndIndicesBlobs +
    DEK-container cleanup)."""
    _read_manifest(repo_dir, name, password)  # raises if absent
    shutil.rmtree(_snap_dir(repo_dir, name))
    live_hashes: set[str] = set()
    live_deks: set[str] = set()
    for man in encrypted_snapshot_list(repo_dir, password):
        live_hashes.update(i["hash"] for i in man["file_map"].values())
        live_deks.add(man["dek_id"])
    blobs = os.path.join(repo_dir, "blobs")
    if os.path.isdir(blobs):
        for b in os.listdir(blobs):
            if b.split(".tmp-")[0] not in live_hashes:
                os.remove(os.path.join(blobs, b))
    dek_root = os.path.join(repo_dir, DEK_ROOT_CONTAINER)
    if os.path.isdir(dek_root):
        for d in os.listdir(dek_root):
            if d not in live_deks:
                shutil.rmtree(os.path.join(dek_root, d),
                              ignore_errors=True)


def verify_repository_password(repo_dir: str, password: str) -> bool:
    """The reference's password-hash verification gate
    (``EncryptedRepository.java:145-146,346-347``): every wrapped-DEK
    directory is checked for a KEK-id entry derivable from this
    password. True iff the password opens every DEK in the repo."""
    dek_root = os.path.join(repo_dir, DEK_ROOT_CONTAINER)
    if not os.path.isdir(dek_root):
        return True
    for dek_id in os.listdir(dek_root):
        kek = crypto.password_based_key(password, dek_id.encode())
        kek_id = crypto.compute_key_id(kek)
        if not os.path.exists(os.path.join(dek_root, dek_id, kek_id)):
            return False
    return True
