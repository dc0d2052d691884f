"""Encrypted snapshot repository (x-pack repository-encrypted analog):
the from-scratch AES/GCM/KeyWrap kernel is pinned to the PUBLISHED
known-answer vectors, the packet stream to the reference's framing
rules, and the repository to round-trip + wrong-password + tamper
semantics."""

import binascii
import json
import os

import pytest

from elasticsearch_ray.index import crypto, encrypted_repo as er


def _h(s):
    return binascii.unhexlify(s)


# ------------------------------------------------------------ kernel KATs

def test_aes_fips197_appendix_c():
    pt = _h("00112233445566778899aabbccddeeff")
    k128 = _h("000102030405060708090a0b0c0d0e0f")
    k256 = _h("000102030405060708090a0b0c0d0e0f"
              "101112131415161718191a1b1c1d1e1f")
    assert crypto.aes_encrypt_block(k128, pt).hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"  # C.1
    ct = crypto.aes_encrypt_block(k256, pt)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"  # C.3
    assert crypto.aes_decrypt_block(k256, ct) == pt


def test_gcm_nist_vectors():
    # AES-256 GCM test cases 13/14 (empty / one zero block)
    ct, tag = crypto.aes_gcm_encrypt(b"\0" * 32, b"\0" * 12, b"")
    assert ct == b""
    assert tag.hex() == "530f8afbc74536b9a963b4f1c4cb738b"
    ct, tag = crypto.aes_gcm_encrypt(b"\0" * 32, b"\0" * 12, b"\0" * 16)
    assert ct.hex() == "cea7403d4d606b6e074ec5d3baf39d18"
    assert tag.hex() == "d0d1c8a799996bf0265b98b5d48ab919"
    # test case 16: 60-byte plaintext + AAD
    key = _h("feffe9928665731c6d6a8f9467308308"
             "feffe9928665731c6d6a8f9467308308")
    iv = _h("cafebabefacedbaddecaf888")
    pt = _h("d9313225f88406e5a55909c5aff5269a86a7a9531534f7da"
            "2e4c303d8a318a721c3c0c95956809532fcf0e2449a6b525"
            "b16aedf5aa0de657ba637b39")
    aad = _h("feedfacedeadbeeffeedfacedeadbeefabaddad2")
    ct, tag = crypto.aes_gcm_encrypt(key, iv, pt, aad)
    assert ct.hex() == ("522dc1f099567d07f47f37a32a84427d643a8cdcbfe5c0c9"
                        "7598a2bd2555d1aa8cb08e48590dbb3da7b08b1056828838"
                        "c5f61e6393ba7a0abcc9f662")
    assert tag.hex() == "76fc6ece0f4e1768cddf8853bb2d551b"
    assert crypto.aes_gcm_decrypt(key, iv, ct, tag, aad) == pt


def test_gcm_tamper_and_wrong_aad_fail():
    key = os.urandom(32)
    iv = os.urandom(12)
    ct, tag = crypto.aes_gcm_encrypt(key, iv, b"payload bytes", b"aad")
    bad = bytes([ct[0] ^ 1]) + ct[1:]
    with pytest.raises(ValueError):
        crypto.aes_gcm_decrypt(key, iv, bad, tag, b"aad")
    with pytest.raises(ValueError):
        crypto.aes_gcm_decrypt(key, iv, ct, tag, b"other-aad")


def test_rfc3394_key_wrap_vector():
    # RFC 3394 §4.6: 256-bit key data with 256-bit KEK
    kek = _h("000102030405060708090a0b0c0d0e0f"
             "101112131415161718191a1b1c1d1e1f")
    kd = _h("00112233445566778899aabbccddeeff"
            "000102030405060708090a0b0c0d0e0f")
    w = crypto.aes_key_wrap(kek, kd)
    assert w.hex().upper() == (
        "28C9F404C4B810F4CBCCB35CFB87F8263F5786E2D80ED326"
        "CBC7F0E71A99F43BFB988B9B7A02DD21")
    assert crypto.aes_key_unwrap(kek, w) == kd
    with pytest.raises(ValueError):
        crypto.aes_key_unwrap(os.urandom(32), w)  # integrity check


def test_key_id_deterministic_and_distinct():
    k1, k2 = os.urandom(32), os.urandom(32)
    assert crypto.compute_key_id(k1) == crypto.compute_key_id(k1)
    assert crypto.compute_key_id(k1) != crypto.compute_key_id(k2)
    # base64url, no padding, printable
    kid = crypto.compute_key_id(k1)
    assert "=" not in kid and "+" not in kid and "/" not in kid


# --------------------------------------------------------- packet stream

def test_packet_stream_roundtrip_sizes():
    dek = os.urandom(32)
    pl = 1024  # small packet length to exercise multi-packet cheaply
    for n in (0, 1, pl - 1, pl, pl + 1, 3 * pl, 3 * pl + 17):
        data = os.urandom(n)
        enc = er.encrypt_packets(dek, 7, data, packet_len=pl)
        assert len(enc) == er.get_encryption_length(n, pl)
        assert er.decrypt_packets(dek, enc, packet_len=pl) == data


def test_packet_stream_reorder_and_truncation_detected():
    dek = os.urandom(32)
    pl = 256
    data = os.urandom(3 * pl)  # 3 full packets + empty final
    enc = er.encrypt_packets(dek, 1, data, packet_len=pl)
    step = 12 + pl + 16
    # swap packets 0 and 1 -> counter discipline breaks
    swapped = enc[step:2 * step] + enc[:step] + enc[2 * step:]
    with pytest.raises(ValueError):
        er.decrypt_packets(dek, swapped, packet_len=pl)
    # drop the final (empty) packet -> truncation detected
    with pytest.raises(ValueError):
        er.decrypt_packets(dek, enc[:3 * step], packet_len=pl)


def test_encrypted_blob_length_formula():
    # EncryptedRepository.getEncryptedBlobByteLength
    assert er.get_encrypted_blob_length(0) == 22 + 28
    n = 5 * er.PACKET_LENGTH + 123
    assert er.get_encrypted_blob_length(n) == 22 + n + 6 * 28


# ----------------------------------------------------------- repository

@pytest.fixture()
def fake_index(tmp_path):
    src = tmp_path / "idx"
    (src / "part-0").mkdir(parents=True)
    (src / "index_meta.json").write_text(json.dumps({"n": 2}))
    (src / "part-0" / "postings.bin").write_bytes(os.urandom(5000))
    (src / "part-0" / "terms.json").write_text('{"a": 1}')
    return str(src)


def test_encrypted_snapshot_roundtrip(fake_index, tmp_path):
    repo = str(tmp_path / "repo")
    man = er.encrypted_snapshot_create(fake_index, repo, "s1", "pw-1")
    assert man["files"] == 3 and man["encrypted"]
    # blobs on disk are ciphertext: no plaintext JSON visible
    blobdir = os.path.join(repo, "blobs")
    for b in os.listdir(blobdir):
        raw = open(os.path.join(blobdir, b), "rb").read()
        assert b'"a": 1' not in raw and b"index_meta" not in raw
    lst = er.encrypted_snapshot_list(repo, "pw-1")
    assert [m["snapshot"] for m in lst] == ["s1"]
    dst = str(tmp_path / "restored")
    er.encrypted_snapshot_restore(repo, "s1", dst, "pw-1")
    for rel in ("index_meta.json", "part-0/postings.bin",
                "part-0/terms.json"):
        a = open(os.path.join(fake_index, rel), "rb").read()
        b = open(os.path.join(dst, rel), "rb").read()
        assert a == b, rel


def test_encrypted_snapshot_wrong_password(fake_index, tmp_path):
    repo = str(tmp_path / "repo")
    er.encrypted_snapshot_create(fake_index, repo, "s1", "correct")
    assert er.verify_repository_password(repo, "correct")
    assert not er.verify_repository_password(repo, "wrong")
    with pytest.raises(ValueError):
        er.encrypted_snapshot_list(repo, "wrong")
    with pytest.raises(ValueError):
        er.encrypted_snapshot_restore(
            repo, "s1", str(tmp_path / "x"), "wrong")


def test_encrypted_snapshot_incremental_reuse(fake_index, tmp_path):
    repo = str(tmp_path / "repo")
    er.encrypted_snapshot_create(fake_index, repo, "s1", "pw")
    man2 = er.encrypted_snapshot_create(fake_index, repo, "s2", "pw")
    assert man2["reused_files"] == 3  # nothing re-encrypted
    # second snapshot's manifest decrypts with its own DEK
    lst = er.encrypted_snapshot_list(repo, "pw")
    assert {m["snapshot"] for m in lst} == {"s1", "s2"}
    assert len({m["dek_id"] for m in lst}) == 2


def test_encrypted_snapshot_delete_gcs_blobs_and_deks(fake_index,
                                                      tmp_path):
    repo = str(tmp_path / "repo")
    er.encrypted_snapshot_create(fake_index, repo, "s1", "pw")
    er.encrypted_snapshot_create(fake_index, repo, "s2", "pw")
    er.encrypted_snapshot_delete(repo, "s2", "pw")
    # s1 still restores; s2's DEK dir is gone
    dst = str(tmp_path / "r1")
    er.encrypted_snapshot_restore(repo, "s1", dst, "pw")
    lst = er.encrypted_snapshot_list(repo, "pw")
    assert [m["snapshot"] for m in lst] == ["s1"]
    deks = os.listdir(os.path.join(repo, er.DEK_ROOT_CONTAINER))
    assert deks == [lst[0]["dek_id"]]
    er.encrypted_snapshot_delete(repo, "s1", "pw")
    assert os.listdir(os.path.join(repo, "blobs")) == []


def test_tampered_blob_fails_restore(fake_index, tmp_path):
    repo = str(tmp_path / "repo")
    er.encrypted_snapshot_create(fake_index, repo, "s1", "pw")
    blobdir = os.path.join(repo, "blobs")
    victim = sorted(os.listdir(blobdir))[0]
    path = os.path.join(blobdir, victim)
    raw = bytearray(open(path, "rb").read())
    raw[-1] ^= 0xFF  # flip a tag byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        er.encrypted_snapshot_restore(
            repo, "s1", str(tmp_path / "out"), "pw")


def test_password_based_key_shape():
    k = crypto.password_based_key("hunter2", b"salt-dek-id")
    assert len(k) == 32
    # deterministic, salt-sensitive
    assert k == crypto.password_based_key("hunter2", b"salt-dek-id")
    assert k != crypto.password_based_key("hunter2", b"other-salt")
