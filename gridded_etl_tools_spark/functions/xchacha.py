"""XChaCha20-Poly1305 chunk encryption — native-format parity for the
reference's ``EncryptionFilter`` (``utils/encryption.py:80-134``).

The reference encrypts every zarr chunk of the data variable with
XChaCha20-Poly1305, framed ``nonce(24) ‖ tag(16) ‖ ciphertext`` with the
AAD header ``b"dClimate-Zarr"``, attached as the numcodecs filter
``{"id": "xchacha20poly1305", "key_hash": <sha3-256 hex>}`` and keyed
through an in-process registry (``metadata.py:863-868``,
``dataset_manager.py:269``).  This module reproduces that construction
byte-for-byte, so a store the reference encrypted opens here once the
same key is registered — and vice versa.

Construction (draft-irtf-cfrg-xchacha): ``subkey = HChaCha20(key,
nonce[:16])``; then IETF ChaCha20-Poly1305 (RFC 8439) with nonce
``b"\\x00" * 4 + nonce[16:]``.  HChaCha20 is the ChaCha20 core without
the final state addition, keeping words 0-3 and 12-15 — ~40 integer ops
once per chunk, implemented here in pure Python.  The bulk AEAD runs on
the ``cryptography`` package's RFC-8439 ``ChaCha20Poly1305`` (C speed;
present in this container, gated behind an import-try).  The pure-Python
round core is cross-checked in tests against ``cryptography``'s raw
ChaCha20 keystream — the full block function (core + final add) must
reproduce it exactly, which pins the quarter-round/ordering/endianness
the HChaCha20 path shares.
"""

from __future__ import annotations

import os
import struct

#: the reference's AAD header (encryption.py:97)
HEADER = b"dClimate-Zarr"

#: numcodecs filter id the reference registers (encryption.py:96)
CODEC_ID = "xchacha20poly1305"

_MASK = 0xFFFFFFFF


def _rotl(v: int, n: int) -> int:
    return ((v << n) & _MASK) | (v >> (32 - n))


def _quarter(s: list[int], a: int, b: int, c: int, d: int) -> None:
    s[a] = (s[a] + s[b]) & _MASK
    s[d] = _rotl(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & _MASK
    s[b] = _rotl(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b]) & _MASK
    s[d] = _rotl(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & _MASK
    s[b] = _rotl(s[b] ^ s[c], 7)


def _chacha20_core(state: list[int]) -> list[int]:
    """20 ChaCha rounds over a 16-word state; returns the worked state
    WITHOUT the final addition (what HChaCha20 keeps)."""
    s = list(state)
    for _ in range(10):
        _quarter(s, 0, 4, 8, 12)
        _quarter(s, 1, 5, 9, 13)
        _quarter(s, 2, 6, 10, 14)
        _quarter(s, 3, 7, 11, 15)
        _quarter(s, 0, 5, 10, 15)
        _quarter(s, 1, 6, 11, 12)
        _quarter(s, 2, 7, 8, 13)
        _quarter(s, 3, 4, 9, 14)
    return s


_SIGMA = struct.unpack("<4I", b"expand 32-byte k")


def chacha20_block(key: bytes, counter: int, nonce12: bytes) -> bytes:
    """One RFC 8439 keystream block (core + final add) — exists for the
    test-time cross-check against ``cryptography``'s ChaCha20."""
    state = list(_SIGMA) + list(struct.unpack("<8I", key)) + [counter] + list(
        struct.unpack("<3I", nonce12)
    )
    worked = _chacha20_core(state)
    return struct.pack("<16I", *((w + s) & _MASK for w, s in zip(worked, state)))


def hchacha20(key: bytes, nonce16: bytes) -> bytes:
    """HChaCha20 subkey derivation: core rounds, keep words 0-3, 12-15,
    NO final add (draft-irtf-cfrg-xchacha §2.2)."""
    if len(key) != 32 or len(nonce16) != 16:
        raise ValueError("HChaCha20 needs a 32-byte key and 16-byte nonce")
    state = list(_SIGMA) + list(struct.unpack("<8I", key)) + list(
        struct.unpack("<4I", nonce16)
    )
    s = _chacha20_core(state)
    return struct.pack("<8I", *(s[0:4] + s[12:16]))


def _aead(subkey: bytes):
    try:
        from cryptography.hazmat.primitives.ciphers.aead import (
            ChaCha20Poly1305,
        )
    except ImportError as exc:  # pragma: no cover - present in container
        raise RuntimeError(
            "xchacha20poly1305 chunk encryption needs the 'cryptography' "
            "package for the RFC 8439 AEAD bulk path"
        ) from exc
    return ChaCha20Poly1305(subkey)


def xchacha20poly1305_encrypt(
    key: bytes, nonce24: bytes, plaintext: bytes, aad: bytes = b""
) -> bytes:
    """Returns ``ciphertext ‖ tag(16)`` (RFC order); framing below."""
    if len(nonce24) != 24:
        raise ValueError("XChaCha20 uses a 24-byte nonce")
    subkey = hchacha20(key, nonce24[:16])
    return _aead(subkey).encrypt(b"\x00" * 4 + nonce24[16:], plaintext, aad)


def xchacha20poly1305_decrypt(
    key: bytes, nonce24: bytes, ct_and_tag: bytes, aad: bytes = b""
) -> bytes:
    if len(nonce24) != 24:
        raise ValueError("XChaCha20 uses a 24-byte nonce")
    subkey = hchacha20(key, nonce24[:16])
    return _aead(subkey).decrypt(b"\x00" * 4 + nonce24[16:], ct_and_tag, aad)


def encrypt_chunk(key: bytes, raw: bytes, header: bytes = HEADER) -> bytes:
    """The reference's exact chunk framing (encryption.py:111-118):
    fresh random 24-byte nonce, AAD header, ``nonce ‖ tag ‖ ct``."""
    nonce = os.urandom(24)
    out = xchacha20poly1305_encrypt(key, nonce, raw, header)
    ct, tag = out[:-16], out[-16:]
    return nonce + tag + ct


def decrypt_chunk(key: bytes, buf: bytes, header: bytes = HEADER) -> bytes:
    """Inverse of :func:`encrypt_chunk` (encryption.py:120-133); raises
    ``cryptography.exceptions.InvalidTag`` on tamper/wrong key."""
    if len(buf) < 40:
        raise ValueError("encrypted chunk shorter than nonce+tag framing")
    nonce, tag, ct = buf[:24], buf[24:40], buf[40:]
    return xchacha20poly1305_decrypt(key, nonce, ct + tag, header)
