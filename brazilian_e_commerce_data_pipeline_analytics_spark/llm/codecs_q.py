"""Registered queries for the REAL media decoders (llm/codecs.py).

These upgrade the multimodal family's evidence from rows-only to
value-exact: payloads are synthesized with integer-deterministic
content, encoded into honest WAV/BMP files, decoded by real parsers,
and the DuckDB oracle replays the decoded features from the same
integer arithmetic — proving the whole binary pipeline (Arrow batch
boundary included) end to end.

Plan shape (both queries): ids -> mapInPandas(encode) ->
mapInPandas(decode) — two Arrow stages over a binary column, zero
driver involvement, partition-parallel. This is exactly the shape a
PIL/ffmpeg deployment uses; only the codec function changes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .codecs import decode_bmp, decode_wav, encode_bmp, encode_wav

# ---------------------------------------------------------------------------
# q156: WAV synth -> RIFF parse -> audio features.
# ---------------------------------------------------------------------------

_Q156_ORACLE = """
WITH m AS (SELECT doc_id AS media_id, 160 + (doc_id % 5) * 80 AS n FROM documents),
s AS (
  SELECT media_id, n,
         list_transform(range(n),
                        k -> ((media_id * 7 + k * 13) % 2003) - 1001) AS smp
  FROM m
)
SELECT media_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(n AS INT) AS n_samples,
       CAST(list_max(list_transform(smp, x -> abs(x))) AS INT) AS peak,
       round(sqrt(list_sum(list_transform(smp, x -> x * x)) / n), 6) AS rms
FROM s
"""


@register("q156_wav_decode", oracle=_Q156_ORACLE, tags=("multimodal", "audio", "codec", "llm"))
def q156_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [encode_wav(int(i)) for i in pdf["media_id"]],
                }
            )

    media = ids.mapInPandas(synth, "media_id long, payload binary")

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [decode_wav(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [r["sample_rate"] for r in rows],
                    "n_samples": [r["n_samples"] for r in rows],
                    "peak": [r["peak"] for r in rows],
                    "rms": [round(r["rms"], 6) for r in rows],
                }
            )

    return media.mapInPandas(
        feats,
        "media_id long, sample_rate int, n_samples int, peak int, rms double",
    )


# ---------------------------------------------------------------------------
# q157: BMP synth -> header/pixel parse -> image features.
# ---------------------------------------------------------------------------

_BMP_CH = "((media_id * 11 + (i % w) * 3 + (i // w) * 7 + {c} * 31) % 256)"

_Q157_ORACLE = f"""
WITH m AS (
  SELECT doc_id AS media_id, 5 + doc_id % 4 AS w, 3 + doc_id % 3 AS h
  FROM documents
)
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       round(list_sum(list_transform(range(w * h), i -> {_BMP_CH.format(c=2)}))
             / (w * h), 6) AS mean_r,
       round(list_sum(list_transform(range(w * h), i -> {_BMP_CH.format(c=1)}))
             / (w * h), 6) AS mean_g,
       round(list_sum(list_transform(range(w * h), i -> {_BMP_CH.format(c=0)}))
             / (w * h), 6) AS mean_b
FROM m
"""


@register("q157_bmp_decode", oracle=_Q157_ORACLE, tags=("multimodal", "image", "codec", "llm"))
def q157_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [encode_bmp(int(i)) for i in pdf["media_id"]],
                }
            )

    media = ids.mapInPandas(synth, "media_id long, payload binary")

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [decode_bmp(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [r["width"] for r in rows],
                    "height": [r["height"] for r in rows],
                    "mean_r": [round(r["mean_r"], 6) for r in rows],
                    "mean_g": [round(r["mean_g"], 6) for r in rows],
                    "mean_b": [round(r["mean_b"], 6) for r in rows],
                }
            )

    return media.mapInPandas(
        feats,
        "media_id long, width int, height int, "
        "mean_r double, mean_g double, mean_b double",
    )


# ---------------------------------------------------------------------------
# q173: video frame sampling — demux the frame container, KEEP every
# 2nd frame (the sample_frames contract: decode cost scales with the
# sample, not the footage), decode the survivors with the real BMP
# parser, and emit per-sampled-frame features. Completes the
# image (q157) / audio (q156) / video triple with value-exact
# evidence; the container format is honest (magic, counts, length
# prefixes, trailing-bytes check), only the inner codec is BMP
# instead of a licensed video codec the container lacks.
# ---------------------------------------------------------------------------

_VID_STRIDE = 2

_VID_CH = "(((media_id * 1000 + f) * 11 + (i % w) * 3 + (i // w) * 7 + 2 * 31) % 256)"

_Q173_ORACLE = f"""
WITH m AS (
  SELECT doc_id AS media_id, 4 + doc_id % 5 AS nf FROM documents
),
fr AS (
  SELECT media_id, unnest(range(nf)) AS f FROM m
),
sampled AS (
  SELECT media_id, f,
         5 + (media_id * 1000 + f) % 4 AS w,
         3 + (media_id * 1000 + f) % 3 AS h
  FROM fr WHERE f % {_VID_STRIDE} = 0
)
SELECT media_id, CAST(f AS INT) AS frame_idx,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       round(list_sum(list_transform(range(w * h), i -> {_VID_CH}))
             / (w * h), 6) AS mean_r
FROM sampled
"""


@register("q173_video_frame_sample", oracle=_Q173_ORACLE, tags=("multimodal", "video", "codec", "llm"))
def q173_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .codecs import decode_bmp, demux_vid, encode_vid

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [encode_vid(int(i)) for i in pdf["media_id"]],
                }
            )

    media = ids.mapInPandas(synth, "media_id long, payload binary")

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "width": [], "height": [], "mean_r": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = demux_vid(bytes(payload))
                for f in range(0, len(frames), _VID_STRIDE):
                    d = decode_bmp(frames[f])
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f)
                    out["width"].append(d["width"])
                    out["height"].append(d["height"])
                    out["mean_r"].append(round(d["mean_r"], 6))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        feats,
        "media_id long, frame_idx int, width int, height int, mean_r double",
    )
