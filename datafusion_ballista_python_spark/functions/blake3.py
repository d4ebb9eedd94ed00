"""Pure-Python BLAKE3 (hash mode only) — closes the last ``digest`` arm.

The reference's ``digest`` supports blake3 (``src/functions.rs:62-70``);
no blake3 library is installable in this deployment, so this implements
the public BLAKE3 spec (IV/permutation/compression from the published
paper) directly.  Used only inside the Arrow-batched pandas UDF behind
``digest(col, 'blake3')`` — a parity arm, not a hot path; at 100 TB use
the JVM-side md5/sha2/xxhash64 builtins for fingerprinting.
"""

from __future__ import annotations

import struct

_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

_CHUNK_START, _CHUNK_END, _PARENT, _ROOT = 1, 2, 4, 8
_MASK = 0xFFFFFFFF


def _compress(cv, block_words, counter, block_len, flags):
    s = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        _IV[0], _IV[1], _IV[2], _IV[3],
        counter & _MASK, (counter >> 32) & _MASK, block_len, flags,
    ]
    m = list(block_words)
    for rnd in range(7):
        # columns
        for i, (a, b, c, d) in enumerate(
            ((0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15))
        ):
            mx, my = m[2 * i], m[2 * i + 1]
            sa = (s[a] + s[b] + mx) & _MASK
            x = s[d] ^ sa
            sd = ((x >> 16) | (x << 16)) & _MASK
            sc = (s[c] + sd) & _MASK
            x = s[b] ^ sc
            sb = ((x >> 12) | (x << 20)) & _MASK
            sa = (sa + sb + my) & _MASK
            x = sd ^ sa
            sd = ((x >> 8) | (x << 24)) & _MASK
            sc = (sc + sd) & _MASK
            x = sb ^ sc
            s[a], s[b], s[c], s[d] = sa, ((x >> 7) | (x << 25)) & _MASK, sc, sd
        # diagonals
        for i, (a, b, c, d) in enumerate(
            ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))
        ):
            mx, my = m[8 + 2 * i], m[8 + 2 * i + 1]
            sa = (s[a] + s[b] + mx) & _MASK
            x = s[d] ^ sa
            sd = ((x >> 16) | (x << 16)) & _MASK
            sc = (s[c] + sd) & _MASK
            x = s[b] ^ sc
            sb = ((x >> 12) | (x << 20)) & _MASK
            sa = (sa + sb + my) & _MASK
            x = sd ^ sa
            sd = ((x >> 8) | (x << 24)) & _MASK
            sc = (sc + sd) & _MASK
            x = sb ^ sc
            s[a], s[b], s[c], s[d] = sa, ((x >> 7) | (x << 25)) & _MASK, sc, sd
        if rnd < 6:
            m = [m[p] for p in _PERM]
    return [
        s[0] ^ s[8], s[1] ^ s[9], s[2] ^ s[10], s[3] ^ s[11],
        s[4] ^ s[12], s[5] ^ s[13], s[6] ^ s[14], s[7] ^ s[15],
        s[8] ^ cv[0], s[9] ^ cv[1], s[10] ^ cv[2], s[11] ^ cv[3],
        s[12] ^ cv[4], s[13] ^ cv[5], s[14] ^ cv[6], s[15] ^ cv[7],
    ]


def _chunk_cv(chunk: bytes, chunk_index: int, is_root: bool) -> list[int]:
    cv = list(_IV)
    n_blocks = max(1, (len(chunk) + 63) // 64)
    out = None
    for i in range(n_blocks):
        block = chunk[i * 64 : (i + 1) * 64]
        block_len = len(block)
        block = block.ljust(64, b"\x00")
        words = struct.unpack("<16I", block)
        flags = 0
        if i == 0:
            flags |= _CHUNK_START
        if i == n_blocks - 1:
            flags |= _CHUNK_END
            if is_root:
                flags |= _ROOT
        out = _compress(cv, words, chunk_index, block_len, flags)
        cv = out[:8]
    return out if is_root else cv


def _parent(left_cv, right_cv, is_root: bool):
    flags = _PARENT | (_ROOT if is_root else 0)
    return _compress(list(_IV), list(left_cv) + list(right_cv), 0, 64, flags)


def blake3_digest(data: bytes, out_len: int = 32) -> bytes:
    """BLAKE3 hash (default 32-byte output), unkeyed hash mode."""
    chunks = [data[i : i + 1024] for i in range(0, len(data), 1024)] or [b""]
    if len(chunks) == 1:
        words = _chunk_cv(chunks[0], 0, True)
        return struct.pack("<16I", *words)[:out_len]
    # chunk CVs, then binary merkle tree: left subtree = largest power of
    # two of chunks, per spec
    cvs = [_chunk_cv(c, i, False) for i, c in enumerate(chunks)]

    def merge(nodes, root):
        if len(nodes) == 1:
            return nodes[0]
        split = 1
        while split * 2 < len(nodes):
            split *= 2
        left = merge(nodes[:split], False)
        right = merge(nodes[split:], False)
        out = _parent(left, right, root)
        return out if root else out[:8]

    words = merge(cvs, True)
    return struct.pack("<16I", *words)[:out_len]
