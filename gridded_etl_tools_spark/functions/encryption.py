"""Column-level encryption (reference parity W18).

The reference encrypts each Zarr chunk with an XChaCha20-Poly1305
numcodecs filter keyed from a registry addressed by the SHA3-256 hash of
the key (``utils/encryption.py:31-139``; registration
``dataset_manager.py:269``).

Spark form: values are rows, not chunks, so the unit of encryption is a
serialized column (the value column, or a packed tile binary).  We use
the built-in ``aes_encrypt`` / ``aes_decrypt`` expressions (JVM-side,
AES-GCM with a random 12-byte IV per value — authenticated like
Poly1305), keeping the whole path inside codegen; the key registry keeps
the reference's hash-addressed semantics so datasets can reference keys
by digest instead of by value.

At 100 TB prefer Parquet modular encryption (KMS-managed, footer +
column keys) for at-rest protection; this operator is for in-band
encrypted columns where individual readers hold the key.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: key registry addressed by SHA3-256 of the raw key bytes (reference
#: ``register_encryption_key``) — driver-side, never shipped to executors
#: except as the literal inside the expression tree.
_KEY_REGISTRY: dict[str, bytes] = {}

#: AES key lengths accepted by aes_encrypt
_VALID_LENGTHS = (16, 24, 32)


def register_encryption_key(key: bytes) -> str:
    """Register a 16/24/32-byte AES key; returns its SHA3-256 hex digest
    (the handle datasets store in metadata instead of the key)."""
    if len(key) not in _VALID_LENGTHS:
        raise ValueError(f"AES key must be one of {_VALID_LENGTHS} bytes, got {len(key)}")
    digest = hashlib.sha3_256(key).hexdigest()
    _KEY_REGISTRY[digest] = key
    return digest


def get_encryption_key(digest: str) -> bytes:
    """Resolve a registered key by its SHA3-256 digest."""
    try:
        return _KEY_REGISTRY[digest]
    except KeyError:
        raise KeyError(f"no encryption key registered under digest {digest[:12]}…") from None


def get_xchacha_key(digest: str) -> bytes:
    """Resolve a registered key for the per-chunk XChaCha20-Poly1305
    filter, enforcing XChaCha's 32-byte key requirement UP FRONT.

    The registry accepts 16/24/32-byte keys (the AES column path takes
    all three), but the zarr chunk filter is XChaCha20 — a 16/24-byte
    key would otherwise pass ``open_store``/sink setup and only fail
    deep inside ``hchacha20`` mid-write, after chunk files were already
    partially written.  Validating here keeps the failure before any
    chunk I/O starts."""
    key = get_encryption_key(digest)
    if len(key) != 32:
        raise ValueError(
            f"XChaCha20-Poly1305 requires a 32-byte key; the key registered "
            f"under digest {digest[:12]}… is {len(key)} bytes (register a "
            "32-byte key for zarr chunk encryption; 16/24-byte keys are "
            "only valid for the AES column path)"
        )
    return key


def encrypt_column(col: Column | str, key_digest: str) -> Column:
    """AES-GCM encrypt a column (binary out: 12-byte IV ‖ ciphertext ‖
    16-byte tag — same framing idea as the reference's nonce+tag+cipher
    chunks)."""
    key = get_encryption_key(key_digest)
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_encrypt(c.cast("binary"), F.lit(key), F.lit("GCM"))


def decrypt_column(col: Column | str, key_digest: str) -> Column:
    """Inverse of :func:`encrypt_column`; fails the task on tampered
    ciphertext (authenticated mode)."""
    key = get_encryption_key(key_digest)
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_decrypt(c, F.lit(key), F.lit("GCM"))


def encrypt_values(
    df: DataFrame, value_col: str, key_digest: str, out_col: str | None = None
) -> DataFrame:
    """Replace (or add) an encrypted binary column for ``value_col``.
    The plaintext column is dropped unless ``out_col`` is given."""
    out = out_col or value_col
    enc = encrypt_column(F.col(value_col).cast("string"), key_digest)
    res = df.withColumn(out, enc)
    if out_col is None:
        return res
    return res


def decrypt_values(
    df: DataFrame, enc_col: str, key_digest: str, cast_to: str = "double",
    out_col: str | None = None,
) -> DataFrame:
    """Decrypt a column produced by :func:`encrypt_values` back to its
    typed form."""
    out = out_col or enc_col
    dec = decrypt_column(F.col(enc_col), key_digest).cast("string").cast(cast_to)
    return df.withColumn(out, dec)
