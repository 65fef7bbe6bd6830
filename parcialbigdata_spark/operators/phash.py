"""Image perceptual-hash (dHash) near-duplicate detection — the
multimodal member of the dedup family (r11, VERDICT #5; SURVEY.md
§2.10 N5×N2). Wang et al.'s difference hash: downsample to an 8×9
grayscale grid, compare horizontally adjacent cells, pack the 64
comparison bits; near-identical images (re-encodes, small edits,
watermarks) land within a few bits of each other while the md5-exact
path (``read_binary_dir``) sees completely different bytes.

Everything is stdlib + numpy — PNG pixel decoding needs only
``zlib.decompress`` and the five PNG filter reconstructions, so unlike
the deliberately-stubbed JPEG/video codecs this path is REAL end to
end (the container walk was already real in ``sources/binary.py``).

Determinism/oracle discipline: every step is integer-exact and chosen
to be replayable in SQL — grayscale is the integer luma
``(299R + 587G + 114B) // 1000``, a pixel (x, y) belongs to grid cell
``((y*8)//H, (x*9)//W)``, a cell's value is ``sum // count``, and the
64 bits pack into FOUR 16-bit band ints (m = row*8 + col, band m//16,
bit position 15 − m%16) — no signed-64-bit packing anywhere, so both
engines compare and XOR plain 32-bit-safe ints. The committed fixtures
(tools/gen_phash_fixtures.py) are stored-block, filter-0 PNGs whose
raw scanlines a DuckDB oracle reads straight out of the blob hex and
replays through the identical arithmetic.

Scale design: the hash is 8 bytes of state per image — the decode is
embarrassingly parallel ``mapInPandas`` over the binary scan (payload
bytes never leave the executor; only file_name + 4 band ints + hex
flow on). Candidate generation reuses the SimHash discipline
(``dedup.simhash_near_dups``): band equality join, pigeonhole-complete
for Hamming ≤ 3 with four bands, per-band ``bit_count`` verification —
never an all-pairs product.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

GRID_W, GRID_H = 9, 8  # 8 comparisons × 8 rows = 64 bits
N_BANDS = 4

DHASH_SCHEMA = (
    "file_name string, width int, height int, "
    "b0 int, b1 int, b2 int, b3 int, dhash_hex string"
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png_gray(b: bytes):
    """bytes -> (width, height, gray) with gray an H×W list of ints,
    or None when not a decodable 8-bit PNG (the guard: wrong magic,
    unsupported depth/interlace, or smaller than the 9×8 grid)."""
    import struct
    import zlib

    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 12 <= len(b):
        (ln,) = struct.unpack(">I", b[pos:pos + 4])
        ctype = b[pos + 4:pos + 8]
        if pos + 12 + ln > len(b):
            return None
        data = b[pos + 8:pos + 8 + ln]
        if ctype == b"IHDR" and ln == 13:
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        pos += 12 + ln
    if ihdr is None:
        return None
    w, h, depth, ct, _, _, interlace = ihdr
    if depth != 8 or interlace != 0 or ct not in (0, 2, 4, 6):
        return None
    if w < GRID_W or h < GRID_H:
        return None
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = 1 + w * nch
    if len(raw) != stride * h:
        return None
    # PNG filter reconstruction (spec §6): Sub/Average/Paeth have an
    # intra-row left dependency, so those rows reconstruct
    # byte-sequentially; rows are independent given the previous row.
    # r14: the dependency-free paths are vectorized — None rows are a
    # zero-copy ``np.frombuffer`` view, Up rows one wrapping uint8 add
    # (identical mod-256 semantics), and the per-PIXEL gray/luma
    # extraction below is one slice / integer dot per row instead of a
    # Python comprehension per pixel. Sub/Average/Paeth keep the exact
    # per-byte loop (a production deployment swaps in a C decoder
    # behind the same kernel signature); all five paths are pinned
    # byte-identical by the filter-equivalence kernel test.
    import numpy as np

    prev = np.zeros(w * nch, dtype=np.uint8)
    gray: list = []
    for y in range(h):
        off = y * stride
        ftype = raw[off]
        if ftype == 0:  # None: the filtered bytes ARE the scanline
            arr = np.frombuffer(raw, np.uint8, count=w * nch, offset=off + 1)
        elif ftype == 2:  # Up: uint8 addition wraps mod 256, as spec'd
            arr = (
                np.frombuffer(raw, np.uint8, count=w * nch, offset=off + 1)
                + prev
            )
        elif ftype in (1, 3, 4):
            line = bytearray(raw[off + 1:off + stride])
            if ftype == 1:  # Sub
                for i in range(nch, len(line)):
                    line[i] = (line[i] + line[i - nch]) & 0xFF
            elif ftype == 3:  # Average
                for i in range(len(line)):
                    left = line[i - nch] if i >= nch else 0
                    line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
            else:  # Paeth
                for i in range(len(line)):
                    left = line[i - nch] if i >= nch else 0
                    up_left = int(prev[i - nch]) if i >= nch else 0
                    line[i] = (line[i] + _paeth(left, int(prev[i]), up_left)) & 0xFF
            arr = np.frombuffer(bytes(line), np.uint8)
        else:
            return None
        prev = arr
        if ct in (0, 4):  # gray / gray+alpha: first channel
            gray.append(arr[0::nch].astype(np.int64))
        else:  # RGB / RGBA: integer luma, alpha ignored
            v = arr.reshape(w, nch).astype(np.int64)
            gray.append((299 * v[:, 0] + 587 * v[:, 1] + 114 * v[:, 2]) // 1000)
    return w, h, gray


def dhash_bands(b: bytes):
    """bytes -> (width, height, [b0..b3]) or None. The exact integer
    pipeline the DuckDB oracle replays: cell (cy, cx) averages
    (sum // count) the pixels with (y*8)//H == cy and (x*9)//W == cx;
    bit m = row*8+col is 1 iff cell[row][col] < cell[row][col+1];
    band m//16 collects bit << (15 − m%16)."""
    import numpy as np

    decoded = _decode_png_gray(b)
    if decoded is None:
        return None
    w, h, gray = decoded
    # r14, vectorized with EXACT integer arithmetic: pixel (x, y) maps
    # to cell ((y·8)//H, (x·9)//W) — monotone in each axis, so cell
    # row/col starts are ceil(c·dim/grid) and the 8×9 sums are two
    # chained ``np.add.reduceat`` passes (int64, bit-identical to the
    # per-pixel accumulation loops this replaces); counts are the
    # outer product of the per-axis run lengths. w ≥ 9 / h ≥ 8 (decode
    # guard) keep both start vectors strictly increasing.
    G = np.stack(gray)  # h × w int64
    col_starts = (np.arange(GRID_W, dtype=np.int64) * w + GRID_W - 1) // GRID_W
    row_starts = (np.arange(GRID_H, dtype=np.int64) * h + GRID_H - 1) // GRID_H
    colsum = np.add.reduceat(G, col_starts, axis=1)
    sums = np.add.reduceat(colsum, row_starts, axis=0)
    cnts = np.outer(
        np.diff(np.append(row_starts, h)), np.diff(np.append(col_starts, w))
    )
    cells = sums // cnts
    bits = (cells[:, :-1] < cells[:, 1:]).astype(np.int64).reshape(-1)  # m = row*8+col
    m = np.arange(GRID_H * (GRID_W - 1), dtype=np.int64)
    weights = np.int64(1) << (15 - (m % 16))
    bands = [
        int(bits[j * 16:(j + 1) * 16] @ weights[j * 16:(j + 1) * 16])
        for j in range(N_BANDS)
    ]
    return w, h, bands


def _dhash_batches(batches: Iterator) -> Iterator:
    import pandas as pd

    def one(name: str, content: bytes) -> dict:
        r = dhash_bands(bytes(content))
        if r is None:
            return {
                "file_name": name, "width": None, "height": None,
                "b0": None, "b1": None, "b2": None, "b3": None,
                "dhash_hex": None,
            }
        w, h, bands = r
        return {
            "file_name": name, "width": w, "height": h,
            "b0": bands[0], "b1": bands[1], "b2": bands[2], "b3": bands[3],
            "dhash_hex": "".join(f"{v:04x}" for v in bands),
        }

    for pdf in batches:
        yield pd.DataFrame(
            [one(n, c) for n, c in zip(pdf["file_name"], pdf["content"])]
        )


def png_dhash(df: DataFrame) -> DataFrame:
    """(file_name, content, …) -> one dHash row per DECODABLE PNG
    (undecodable or sub-grid files return NULL bands and are filtered;
    the size guard is part of the contract — a 6×6 icon has no 9×8
    grid). Arrow-batched ``mapInPandas``; payloads never leave the
    executor."""
    out = df.select("file_name", "content").mapInPandas(
        _dhash_batches, DHASH_SCHEMA
    )
    return out.filter(F.col("b0").isNotNull())


def dhash_near_dups(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Banded Hamming near-dup pairs over :func:`png_dhash` output —
    the image twin of ``dedup.simhash_near_dups``: explode the four
    16-bit bands, join on (band_idx, band_val) equality, verify exact
    Hamming as the SUM of per-band ``bit_count`` XORs. Pigeonhole:
    ≤ 3 differing bits cannot touch all four bands, so the banded
    candidates are COMPLETE for the default threshold — the oracle's
    all-pairs scan must agree exactly. Never an all-pairs product
    (tests pin the plan free of cartesian joins)."""
    if max_hamming > N_BANDS - 1:
        raise ValueError(
            f"dhash_near_dups: banded candidates are only complete for "
            f"max_hamming <= {N_BANDS - 1} (pigeonhole over {N_BANDS} "
            f"bands); got {max_hamming}."
        )
    cols = ["file_name", "b0", "b1", "b2", "b3"]
    banded = hashes.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.col(f"b{i}").alias("band_val"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("c"),
    ).select(*cols, "c.band_idx", "c.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    ham = sum(
        F.bit_count(
            F.col(f"a.b{i}").bitwiseXOR(F.col(f"b.b{i}")).cast("int")
        )
        for i in range(N_BANDS)
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.file_name") < F.col("b.file_name")),
        )
        .select(
            F.col("a.file_name").alias("file_a"),
            F.col("b.file_name").alias("file_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# -------------------------------- cross-run perceptual-hash index (r12)
#
# The media completion of the index-maintenance matrix (minhash bands /
# IVF cells → now perceptual-hash bands): the historical corpus's
# hashes persist as ONE table bucketed on a 64-bit band key — no
# separate verification-sets table, because the verification state IS
# the 8-byte hash riding every band row — and each arriving media
# batch is decoded once, its band rows joined against the stored
# layout (only the BATCH side shuffles), candidates verified by exact
# per-band bit_count Hamming, then appended. Modality-agnostic: any
# hash relation with (file_name, b0..b3) works, so the image dHash and
# audio aHash share it.


def _band_rows(hashes: DataFrame):
    cols = ["file_name", "b0", "b1", "b2", "b3"]
    return hashes.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.col(f"b{i}").alias("band_val"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("c"),
    ).select(
        *cols,
        # Single 64-bit join/bucket key (the minhash band_hash
        # discipline): bucketBy one column, join one column; a hash
        # collision can only ADD a candidate, which the exact Hamming
        # verify below discards.
        F.xxhash64("c.band_idx", "c.band_val").alias("band_hash"),
    )


def phash_index_ingest(
    hashes: DataFrame,
    bands_table: str,
    num_buckets: int = 8,
    append: bool = False,
) -> None:
    """Persist a media batch's perceptual hashes into the banded index
    table (bucketed on ``band_hash``). Decode happens ONCE per file
    ever — the index stores 4 band rows × ~50 bytes per file, so at
    100 TB of media the index is GB-sized and only the arriving
    batch's rows shuffle on append."""
    from parcialbigdata_spark.sources.warehouse import write_bucketed

    # sort=False (r15, same measured finding as the minhash index):
    # bucket sortedness is only exploitable on single-file buckets,
    # which appends immediately break — probes re-sort or broadcast
    # regardless, so the write-side sort is never redeemed.
    write_bucketed(
        _band_rows(hashes),
        bands_table,
        "band_hash",
        num_buckets=num_buckets,
        mode="append" if append else "overwrite",
        sort=False,
    )


def phash_index_probe(
    batch_hashes: DataFrame,
    bands_table: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs (new_file, old_file, hamming) between a NEW media
    batch's hashes and the persisted index — without re-decoding any
    historical media. Pigeonhole-complete at ``max_hamming ≤ 3``: a
    pair within 3 bits shares at least one of four bands, hence one
    band_hash. Startup recovery for an interrupted compaction swap is
    memoized per session (``recover_staged_swap(once=True)``)."""
    if max_hamming > N_BANDS - 1:
        raise ValueError(
            f"phash_index_probe: banded candidates are only complete for "
            f"max_hamming <= {N_BANDS - 1}; got {max_hamming}."
        )
    from parcialbigdata_spark.sources.warehouse import recover_staged_swap

    spark = batch_hashes.sparkSession
    recover_staged_swap(spark, bands_table, once=True)
    probe = _band_rows(batch_hashes).withColumnRenamed("file_name", "new_file")
    stored = spark.table(bands_table).select(
        F.col("file_name").alias("old_file"),
        *[F.col(f"b{i}").alias(f"ob{i}") for i in range(N_BANDS)],
        "band_hash",
    )
    ham = sum(
        F.bit_count(F.col(f"b{i}").bitwiseXOR(F.col(f"ob{i}")).cast("int"))
        for i in range(N_BANDS)
    )
    return (
        probe.join(stored, "band_hash")
        .filter(F.col("new_file") != F.col("old_file"))
        .select("new_file", "old_file", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def phash_index_compact(
    spark,
    bands_table: str,
    num_buckets: int = 8,
) -> None:
    """Collapse duplicate band rows left by at-least-once replayed
    appends (duplicates multiply probe candidate rows; the distinct
    output is byte-identical because hashing is deterministic) into a
    staged same-layout rewrite + the crash-recoverable catalog swap
    shared with the minhash/IVF compactions."""
    from parcialbigdata_spark.sources.warehouse import (
        swap_staged_table,
        write_bucketed,
    )

    rows = spark.table(bands_table).distinct()
    write_bucketed(
        rows, f"{bands_table}__compact", "band_hash", num_buckets=num_buckets
    )
    swap_staged_table(spark, bands_table)
