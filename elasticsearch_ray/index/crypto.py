"""From-scratch AES-256 / GCM / RFC 3394 key wrap / PBKDF2 — the crypto
kernel behind the encrypted snapshot repository
(``x-pack/plugin/repository-encrypted`` — ``AESKeyUtils.java``,
``EncryptedRepository.java``, ``EncryptionPacketsInputStream.java``).

Everything is implemented from the PUBLIC specifications only:

- AES block cipher: FIPS-197. The S-box is COMPUTED from its definition
  (multiplicative inverse in GF(2^8) mod x^8+x^4+x^3+x+1, then the
  affine transform, §5.1.1) rather than transcribed, so a typo can't
  corrupt it; the cipher is pinned to the FIPS-197 appendix-C.3 AES-256
  known-answer vector in tests.
- GCM mode: NIST SP 800-38D (GHASH in the bit-reflected GF(2^128),
  right-shift multiply per §6.3; 96-bit IV fast path J0 = IV || 0^31 1).
  Pinned to the canonical AES-256 GCM test cases 13/14/16.
- AES Key Wrap: RFC 3394 §2.2.1 (64-bit halves, 6·n rounds, default IV
  ``A6A6A6A6A6A6A6A6``), pinned to the §4.6 vector.
- PBKDF2: delegated to the stdlib ``hashlib.pbkdf2_hmac`` (HMAC-SHA512,
  the reference's ``PBKDF2WithHmacSHA512`` with its 61616 iterations).

Performance shape: the cipher is VECTORIZED over blocks with numpy —
`_encrypt_blocks` runs all 14 rounds on an ``(N, 16)`` uint8 array at
once (table lookups + index permutations + xors), so CTR keystream for
a 64 KiB packet is one call on 4096 blocks, not 4096 Python calls. The
sequential part is GHASH (a 128-bit carry chain per 16-byte block, like
every software GCM); packets are independent, so blob encryption
parallelizes per packet across Ray tasks if ever needed at scale.
"""

from __future__ import annotations

import hashlib

import numpy as np

# ------------------------------------------------------------------ tables
# GF(2^8) log/antilog via generator 3 (x+1), FIPS-197 §4.2


def _build_tables():
    exp = np.zeros(256, dtype=np.uint8)
    log = np.zeros(256, dtype=np.int32)
    v = 1
    for i in range(255):
        exp[i] = v
        log[v] = i
        v ^= (v << 1) & 0xFF ^ (0x1B if v & 0x80 else 0)  # v *= 3
    exp[255] = exp[0]

    def gf_inv(b: int) -> int:
        return 0 if b == 0 else int(exp[(255 - log[b]) % 255])

    sbox = np.zeros(256, dtype=np.uint8)
    for b in range(256):
        c = gf_inv(b)
        r = 0x63
        for _ in range(5):  # affine: b ^ rotl1..4(b) ^ 0x63 (§5.1.1)
            r ^= c
            c = ((c << 1) | (c >> 7)) & 0xFF
        sbox[b] = r
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)

    xt = np.zeros(256, dtype=np.uint8)  # xtime: multiply by x (·2)
    for b in range(256):
        xt[b] = ((b << 1) & 0xFF) ^ (0x1B if b & 0x80 else 0)

    def mul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return int(exp[(int(log[a]) + int(log[b])) % 255])

    mul_tabs = {n: np.array([mul(b, n) for b in range(256)],
                            dtype=np.uint8) for n in (2, 3, 9, 11, 13, 14)}
    return sbox, inv_sbox, xt, mul_tabs


_SBOX, _INV_SBOX, _XTIME, _MUL = _build_tables()

# byte i of the input maps to state[i % 4][i // 4]; ShiftRows rotates row
# r left by r.  On the flat 16-byte layout (column-major state) the
# shifted byte at flat position c*4+r comes from ((c+r)%4)*4+r.
_SHIFT_IDX = np.array([((c + r) % 4) * 4 + r for c in range(4)
                       for r in range(4)], dtype=np.int64)
_INV_SHIFT_IDX = np.zeros(16, dtype=np.int64)
_INV_SHIFT_IDX[_SHIFT_IDX] = np.arange(16)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _expand_key(key: bytes) -> np.ndarray:
    """FIPS-197 §5.2 key expansion -> (Nr+1, 16) uint8 round keys."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16/24/32 bytes")
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    rk = np.array(w, dtype=np.uint8).reshape(nr + 1, 16)
    return rk


def _encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """AES cipher (§5.1) over an (N, 16) uint8 array, vectorized."""
    nr = rk.shape[0] - 1
    s = blocks ^ rk[0]
    for rnd in range(1, nr):
        s = _SBOX[s][:, _SHIFT_IDX]
        col = s.reshape(-1, 4, 4)
        a0, a1 = col[:, :, 0], col[:, :, 1]
        a2, a3 = col[:, :, 2], col[:, :, 3]
        m2, m3 = _MUL[2], _MUL[3]
        out = np.empty_like(col)
        out[:, :, 0] = m2[a0] ^ m3[a1] ^ a2 ^ a3
        out[:, :, 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3
        out[:, :, 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3]
        out[:, :, 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3]
        s = out.reshape(-1, 16) ^ rk[rnd]
    s = _SBOX[s][:, _SHIFT_IDX] ^ rk[nr]
    return s


def _decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """Inverse cipher (§5.3), for RFC 3394 unwrap."""
    nr = rk.shape[0] - 1
    s = blocks ^ rk[nr]
    for rnd in range(nr - 1, 0, -1):
        s = _INV_SBOX[s[:, _INV_SHIFT_IDX]] ^ rk[rnd]
        col = s.reshape(-1, 4, 4)
        a0, a1 = col[:, :, 0], col[:, :, 1]
        a2, a3 = col[:, :, 2], col[:, :, 3]
        m9, m11 = _MUL[9], _MUL[11]
        m13, m14 = _MUL[13], _MUL[14]
        out = np.empty_like(col)
        out[:, :, 0] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
        out[:, :, 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
        out[:, :, 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
        out[:, :, 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
        s = out.reshape(-1, 16)
    s = _INV_SBOX[s[:, _INV_SHIFT_IDX]] ^ rk[0]
    return s


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    return _encrypt_blocks(
        np.frombuffer(block, dtype=np.uint8).reshape(1, 16), rk).tobytes()


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    return _decrypt_blocks(
        np.frombuffer(block, dtype=np.uint8).reshape(1, 16), rk).tobytes()


# --------------------------------------------------------------------- CTR

def _ctr_keystream(rk: np.ndarray, j0_int: int, n_blocks: int) -> np.ndarray:
    """inc32-based counter blocks CB1.. (SP 800-38D §6.5/7.1)."""
    base, low = j0_int >> 32, j0_int & 0xFFFFFFFF
    ctrs = (low + 1 + np.arange(n_blocks, dtype=np.uint64)) & \
        np.uint64(0xFFFFFFFF)
    blocks = np.empty((n_blocks, 16), dtype=np.uint8)
    hi = base.to_bytes(12, "big")
    blocks[:, :12] = np.frombuffer(hi, dtype=np.uint8)
    blocks[:, 12:] = ctrs.astype(">u4").view(np.uint8).reshape(-1, 4)
    return _encrypt_blocks(blocks, rk)


# ------------------------------------------------------------------- GHASH

def _gf_mult(x: int, y: int) -> int:
    """GF(2^128) multiply, right-shift method (SP 800-38D §6.3:
    R = 0xE1 || 0^120)."""
    z, v = 0, x
    for i in range(127, -1, -1):
        if (y >> i) & 1:
            z ^= v
        if v & 1:
            v = (v >> 1) ^ (0xE1 << 120)
        else:
            v >>= 1
    return z


def _rshift1(v: int) -> int:
    """Divide by x in the bit-reflected field (the v-update step of
    §6.3's right-shift multiply)."""
    return (v >> 1) ^ (0xE1 << 120) if v & 1 else v >> 1


_GHASH_TABLES: dict[int, list[list[int]]] = {}


def _ghash_table(h_int: int) -> list[list[int]]:
    """Shoup's 8-bit table method (public; standard in software GCMs):
    T[i][b] = H · (b << (120-8i)) so a block product is 16 lookups+xors
    instead of a 128-step bit loop per block."""
    tab = _GHASH_TABLES.get(h_int)
    if tab is not None:
        return tab
    base = [0] * 8  # base[j] = H · x^j  (j = bit index from the top)
    base[0] = h_int
    for j in range(1, 8):
        base[j] = _rshift1(base[j - 1])
    t0 = [0] * 256
    for b in range(256):
        acc = 0
        for j in range(8):
            if b & (0x80 >> j):
                acc ^= base[j]
        t0[b] = acc
    tab = [t0]
    for _ in range(15):
        prev = tab[-1]
        nxt = [0] * 256
        for b in range(256):
            v = prev[b]
            for _ in range(8):
                v = _rshift1(v)
            nxt[b] = v
        tab.append(nxt)
    if len(_GHASH_TABLES) > 8:  # tiny LRU-ish guard; keys are few
        _GHASH_TABLES.clear()
    _GHASH_TABLES[h_int] = tab
    return tab


def _ghash(h_int: int, data: bytes) -> int:
    tab = _ghash_table(h_int)
    y = 0
    n_full = len(data) // 16 * 16
    for off in range(0, n_full, 16):
        x = y ^ int.from_bytes(data[off:off + 16], "big")
        acc = 0
        for i in range(16):
            acc ^= tab[i][(x >> (120 - 8 * i)) & 0xFF]
        y = acc
    if n_full != len(data):
        blk = data[n_full:] + b"\x00" * (16 - (len(data) - n_full))
        x = y ^ int.from_bytes(blk, "big")
        acc = 0
        for i in range(16):
            acc ^= tab[i][(x >> (120 - 8 * i)) & 0xFF]
        y = acc
    return y


def aes_gcm_encrypt(key: bytes, iv: bytes, plaintext: bytes,
                    aad: bytes = b"") -> tuple[bytes, bytes]:
    """-> (ciphertext, 16-byte tag). 96-bit IVs only (the repository
    scheme never uses another length; SP 800-38D §8.2.1)."""
    if len(iv) != 12:
        raise ValueError("GCM IV must be 12 bytes")
    rk = _expand_key(key)
    h = int.from_bytes(_encrypt_blocks(
        np.zeros((1, 16), dtype=np.uint8), rk).tobytes(), "big")
    j0 = (int.from_bytes(iv, "big") << 32) | 1
    n = (len(plaintext) + 15) // 16
    ct = b""
    if n:
        ks = _ctr_keystream(rk, j0, n).reshape(-1)[:len(plaintext)]
        ct = (np.frombuffer(plaintext, dtype=np.uint8) ^ ks).tobytes()
    pad_a = b"\x00" * ((16 - len(aad) % 16) % 16)
    pad_c = b"\x00" * ((16 - len(ct) % 16) % 16)
    lens = (len(aad) * 8).to_bytes(8, "big") + \
        (len(ct) * 8).to_bytes(8, "big")
    s = _ghash(h, aad + pad_a + ct + pad_c + lens)
    ek_j0 = _encrypt_blocks(np.frombuffer(
        j0.to_bytes(16, "big"), dtype=np.uint8).reshape(1, 16),
        rk).tobytes()
    tag = (s ^ int.from_bytes(ek_j0, "big")).to_bytes(16, "big")
    return ct, tag


def aes_gcm_decrypt(key: bytes, iv: bytes, ciphertext: bytes, tag: bytes,
                    aad: bytes = b"") -> bytes:
    """Verify-then-decrypt; raises ValueError on tag mismatch."""
    ct2, expect = aes_gcm_encrypt(key, iv, ciphertext, aad)
    # GCM is CTR either way: re-encrypting the ciphertext yields the
    # plaintext, but the tag must be computed over the CIPHERTEXT
    rk = _expand_key(key)
    h = int.from_bytes(_encrypt_blocks(
        np.zeros((1, 16), dtype=np.uint8), rk).tobytes(), "big")
    j0 = (int.from_bytes(iv, "big") << 32) | 1
    pad_c = b"\x00" * ((16 - len(ciphertext) % 16) % 16)
    pad_a = b"\x00" * ((16 - len(aad) % 16) % 16)
    lens = (len(aad) * 8).to_bytes(8, "big") + \
        (len(ciphertext) * 8).to_bytes(8, "big")
    s = _ghash(h, aad + pad_a + ciphertext + pad_c + lens)
    ek_j0 = _encrypt_blocks(np.frombuffer(
        j0.to_bytes(16, "big"), dtype=np.uint8).reshape(1, 16),
        rk).tobytes()
    want = (s ^ int.from_bytes(ek_j0, "big")).to_bytes(16, "big")
    if not _const_eq(want, tag):
        raise ValueError("GCM tag mismatch (wrong key or corrupt data)")
    return ct2


def _const_eq(a: bytes, b: bytes) -> bool:
    import hmac
    return hmac.compare_digest(a, b)


# --------------------------------------------------------- RFC 3394 wrap

_KW_IV = 0xA6A6A6A6A6A6A6A6


def aes_key_wrap(kek: bytes, key_data: bytes) -> bytes:
    """RFC 3394 §2.2.1 (the reference's ``Cipher.getInstance("AESWrap")``)."""
    if len(key_data) % 8 or len(key_data) < 16:
        raise ValueError("key data must be 8-byte blocks, >= 16 bytes")
    rk = _expand_key(kek)
    n = len(key_data) // 8
    a = _KW_IV
    r = [int.from_bytes(key_data[8 * i:8 * i + 8], "big")
         for i in range(n)]
    for j in range(6):
        for i in range(n):
            blk = (a << 64 | r[i]).to_bytes(16, "big")
            b = int.from_bytes(_encrypt_blocks(np.frombuffer(
                blk, dtype=np.uint8).reshape(1, 16), rk).tobytes(), "big")
            a = (b >> 64) ^ (n * j + i + 1)
            r[i] = b & 0xFFFFFFFFFFFFFFFF
    return a.to_bytes(8, "big") + b"".join(x.to_bytes(8, "big") for x in r)


def aes_key_unwrap(kek: bytes, wrapped: bytes) -> bytes:
    """RFC 3394 §2.2.2; raises ValueError on IV (integrity) mismatch."""
    if len(wrapped) % 8 or len(wrapped) < 24:
        raise ValueError("wrapped key must be 8-byte blocks, >= 24 bytes")
    rk = _expand_key(kek)
    n = len(wrapped) // 8 - 1
    a = int.from_bytes(wrapped[:8], "big")
    r = [int.from_bytes(wrapped[8 * (i + 1):8 * (i + 2)], "big")
         for i in range(n)]
    for j in range(5, -1, -1):
        for i in range(n - 1, -1, -1):
            blk = ((a ^ (n * j + i + 1)) << 64 | r[i]).to_bytes(16, "big")
            b = int.from_bytes(_decrypt_blocks(np.frombuffer(
                blk, dtype=np.uint8).reshape(1, 16), rk).tobytes(), "big")
            a = b >> 64
            r[i] = b & 0xFFFFFFFFFFFFFFFF
    if a != _KW_IV:
        raise ValueError("key unwrap integrity check failed "
                         "(wrong password?)")
    return b"".join(x.to_bytes(8, "big") for x in r)


# ------------------------------------------------------------------ PBKDF2

KDF_ITERATIONS = 61616  # AESKeyUtils.KDF_ITER


def password_based_key(password: str, salt: bytes,
                       iterations: int = KDF_ITERATIONS) -> bytes:
    """AESKeyUtils.generatePasswordBasedKey: PBKDF2WithHmacSHA512 ->
    256-bit AES key."""
    return hashlib.pbkdf2_hmac("sha512", password.encode("utf-8"), salt,
                               iterations, dklen=32)


_KEY_ID_PLAINTEXT = b"wrapping known text forms key id"  # AESKeyUtils


def compute_key_id(key: bytes) -> str:
    """AESKeyUtils.computeId: base64url(no pad) of AES-wrap(key, fixed
    32-byte plaintext) — deterministic, publishable, collision-safe."""
    import base64
    return base64.urlsafe_b64encode(
        aes_key_wrap(key, _KEY_ID_PLAINTEXT)).rstrip(b"=").decode()
