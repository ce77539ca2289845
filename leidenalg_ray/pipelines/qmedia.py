"""Multimodal catalogue rows — see queries.py."""

from .qcore import *  # noqa: F401,F403
from .qcore import (  # noqa: F401
    _docs,
)


def q_media_decode(sf_dir):
    """Multimodal decode plumbing, driver-verified: documents as a
    media table (payload = utf8 text, kind by id residue), decoded by
    the actor-pool ``MediaDecoderMd5`` stub — dimensions/frames/
    features derive from the payload md5 so the SQL oracle replicates
    the whole stage; the real-codec seam stays
    ``MediaDecoder(decode='real')`` (raises: no codecs here)."""
    from ..stages import multimodal as mm
    media = mm.docs_as_media(_docs(sf_dir))
    return media.map_batches(mm.MediaDecoderMd5, batch_format="pyarrow",
                             batch_size=64, zero_copy_batch=True,
                             concurrency=(1, 4))


SQL_MEDIA_DECODE = """
WITH b AS (SELECT doc_id AS media_id,
                  CASE doc_id % 3 WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                  md5(text) AS h
           FROM documents),
d AS (SELECT media_id, kind,
             ('0x' || substr(h, 1, 2))::INT AS b0,
             ('0x' || substr(h, 3, 2))::INT AS b1,
             ('0x' || substr(h, 5, 2))::INT AS b2,
             ('0x' || substr(h, 7, 2))::INT AS b3
      FROM b)
SELECT media_id, kind,
       CAST(64 + b0 * 4 AS BIGINT) AS width,
       CAST(64 + b1 * 4 AS BIGINT) AS height,
       CAST(CASE WHEN kind = 'image' THEN 1 ELSE 1 + b2 END
            AS BIGINT) AS n_frames,
       round(b0 / 255.0, 6) AS f0, round(b1 / 255.0, 6) AS f1,
       round(b2 / 255.0, 6) AS f2, round(b3 / 255.0, 6) AS f3
FROM d
"""


def q_media_decode_real(sf_dir):
    """REAL byte-level media decode through the actor pool — no stub:
    ``synth_real_media_table`` writes valid 24-bit BMPs, REAL
    zlib-compressed 8-bit PNGs (row filters 0..4 all exercised), and
    16-bit PCM WAVs whose dimensions/colors/samples are closed forms
    of the media id; ``MediaDecoderRealFlat`` parses the actual bytes
    (BITMAPINFOHEADER rows with 4-byte padding, PNG inflate +
    5-filter scanline reconstruction, RIFF chunks) and computes
    channel means / luminance / rms / peak / zcr / duration — the SQL
    oracle reproduces every value from id arithmetic alone, so any
    parse or unfilter bug is a gate FAIL. r5: ids with i%8==6 ship as
    REAL baseline 4:2:0 huffman JPEGs; their oracle replays the
    fixed-point DC quantise/dequantise/IDCT closed form of the
    constant-colour blocks (``_sql_jpeg_img_ctes``). MP3 / H.264 /
    progressive JPEG remain the documented ``NotImplementedError``
    seam."""
    from ..stages import multimodal as mm
    media = rd.from_arrow(mm.synth_real_media_table(90))
    return media.map_batches(mm.MediaDecoderRealFlat,
                             batch_format="pyarrow", batch_size=16,
                             zero_copy_batch=True, concurrency=(1, 4))


def _sql_jpeg_rec(v, q):
    """SQL closed form of one constant channel through the baseline
    JPEG fixed-point pipeline (multimodal.encode_jpeg/decode_jpeg):
    DC-only block -> quantise (round-half-away) -> dequantise ->
    11-bit fixed-point IDCT -> +128, clip. 33547264 = (8*724)^2,
    524176 = 724^2, 724 = round(2048/sqrt(8))."""
    f = f"(33547264*({v}-128))"
    s = (f"CAST(floor((2*abs({f}) + {q * 4194304}) / "
         f"{2 * q * 4194304}.0) AS BIGINT)")
    dc = f"(CASE WHEN {f} < 0 THEN -{s} ELSE {s} END)"
    return (f"LEAST(255, GREATEST(0, CAST(floor((524176*{dc}*{q} "
            f"+ 2097152)/4194304.0) AS BIGINT) + 128))")


def _sql_jpeg_img_ctes():
    """CTE chain replaying the decoded constant colour of every even
    media id: BMP/PNG ids decode losslessly; JPEG ids (i%8=6) replay
    the fixed-point quantisation closed form."""
    return f"""
raw AS (SELECT i, (i*37)%256 AS r, (i*59)%256 AS g, (i*83)%256 AS b
        FROM ids WHERE i%2=0),
jy AS (SELECT i, r, g, b,
  LEAST(255, GREATEST(0, CAST(floor(0.299*r + 0.587*g + 0.114*b
                                    + 0.5) AS BIGINT))) AS y,
  LEAST(255, GREATEST(0, CAST(floor(-0.168736*r - 0.331264*g
                                    + 0.5*b + 128.5) AS BIGINT)))
    AS cb,
  LEAST(255, GREATEST(0, CAST(floor(0.5*r - 0.418688*g - 0.081312*b
                                    + 128.5) AS BIGINT))) AS cr
  FROM raw),
jq AS (SELECT i, r, g, b, {_sql_jpeg_rec('y', 16)} AS py,
              {_sql_jpeg_rec('cb', 17)} AS pcb,
              {_sql_jpeg_rec('cr', 17)} AS pcr
  FROM jy),
img AS (SELECT i,
  CASE WHEN i%8=6 THEN LEAST(255, GREATEST(0,
    CAST(floor(py + 1.402*(pcr-128.0) + 0.5) AS BIGINT)))
    ELSE r END AS r,
  CASE WHEN i%8=6 THEN LEAST(255, GREATEST(0,
    CAST(floor(py - 0.344136*(pcb-128.0) - 0.714136*(pcr-128.0)
               + 0.5) AS BIGINT))) ELSE g END AS g,
  CASE WHEN i%8=6 THEN LEAST(255, GREATEST(0,
    CAST(floor(py + 1.772*(pcb-128.0) + 0.5) AS BIGINT)))
    ELSE b END AS b
  FROM jq)"""


SQL_MEDIA_DECODE_REAL = f"""
WITH ids AS (SELECT unnest(generate_series(0, 89)) AS i),
{_sql_jpeg_img_ctes()},
aud AS (SELECT i, 800 + (i%5)*80 AS n, (i*291)%32768 AS v
        FROM ids WHERE i%2=1)
SELECT CAST(i AS BIGINT) AS media_id, 'image' AS kind,
       CAST(8 + i%13 AS BIGINT) AS width,
       CAST(8 + i%7 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS n_frames,
       round(r/255.0, 6) AS f0, round(g/255.0, 6) AS f1,
       round(b/255.0, 6) AS f2,
       round((299*r + 587*g + 114*b)/255000.0, 6) AS f3
FROM img
UNION ALL
SELECT CAST(i AS BIGINT), 'audio', 0, 0, CAST(n AS BIGINT),
       round(v/32768.0, 6), round(v/32768.0, 6), 0.0,
       round(n/8000.0, 6)
FROM aud
"""


def q_media_ann(sf_dir):
    """Composition row: REAL media decode feeds the similarity-search
    stack. Decoded BMP feature vectors (channel means + luminance,
    round6) become the embedding column; images 2/4/6 are the query
    vectors (also obtained THROUGH the byte-level decode); brute-force
    cosine top-5 over the image corpus. Media 0 is excluded on both
    sides (its constant-black image is the zero vector — cosine is
    undefined and engines disagree on NaN ordering)."""
    from ..stages import multimodal as mm
    media_tab = mm.synth_real_media_table(90)
    feats_ds = rd.from_arrow(media_tab).map_batches(
        mm.MediaDecoderRealFlat, batch_format="pyarrow",
        batch_size=16, zero_copy_batch=True, concurrency=(1, 4))

    def to_emb(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.equal(t["kind"], "image"),
                             pc.greater(t["media_id"], 0)))
        f = np.stack([t[f"f{j}"].to_numpy() for j in range(4)],
                     axis=1)
        return pa.table({
            "vec_id": t["media_id"],
            "embedding": pa.array(f.tolist(), pa.list_(pa.float64())),
        })

    emb = feats_ds.map_batches(to_emb, batch_format="pyarrow",
                               zero_copy_batch=True)
    qsel = media_tab.filter(
        pc.is_in(media_tab["media_id"],
                 pa.array([2, 4, 6], pa.int64())))
    qrows = mm.MediaDecoderRealFlat()(qsel)
    qv = np.stack([qrows[f"f{j}"].to_numpy() for j in range(4)],
                  axis=1)
    return annm.brute_force_topk(
        emb, qv, qrows["media_id"].to_numpy(zero_copy_only=False),
        k=5)


SQL_MEDIA_ANN = f"""
WITH ids AS (SELECT unnest(generate_series(2, 89)) AS i),
{_sql_jpeg_img_ctes()},
f AS (SELECT i,
             list_value(
               round(r/255.0, 6),
               round(g/255.0, 6),
               round(b/255.0, 6),
               round((299*r + 587*g + 114*b)/255000.0, 6)) AS emb
      FROM img)
SELECT CAST(q.i AS BIGINT) AS query_id, CAST(e.i AS BIGINT) AS vec_id,
       round(list_cosine_similarity(CAST(q.emb AS DOUBLE[]),
                                    CAST(e.emb AS DOUBLE[])), 6)
           AS cos,
       CAST(row_number() OVER (
           PARTITION BY q.i
           ORDER BY list_cosine_similarity(
               CAST(q.emb AS DOUBLE[]),
               CAST(e.emb AS DOUBLE[])) DESC, e.i)
         AS BIGINT) AS rank
FROM f q CROSS JOIN f e
WHERE q.i IN (2, 4, 6)
QUALIFY rank <= 5
"""


MEDIA_FRAME_EVERY = 2


def q_media_frame_sample(sf_dir):
    """Frame-sampling plumbing, driver-verified: one row per sampled
    frame index (stride 2) of each 'video' row; images/audio pass
    through as frame 0."""
    from ..stages import multimodal as mm
    import hashlib as _h
    media = mm.docs_as_media(_docs(sf_dir))

    def sample(batch: pa.Table) -> pa.Table:
        ids, kinds, frames = [], [], []
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind == "video":
                n = 1 + _h.md5(payload).digest()[2]
                for f in range(0, n, MEDIA_FRAME_EVERY):
                    ids.append(mid); kinds.append(kind)
                    frames.append(f)
            else:
                ids.append(mid); kinds.append(kind)
                frames.append(0)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "frame": pa.array(frames, pa.int64()),
        })
    return media.map_batches(sample, batch_format="pyarrow",
                             batch_size=64, zero_copy_batch=True)


SQL_MEDIA_FRAME_SAMPLE = f"""
WITH b AS (SELECT doc_id AS media_id,
                  CASE doc_id % 3 WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                  1 + ('0x' || substr(md5(text), 5, 2))::INT AS n
           FROM documents)
-- static series + predicate: DuckDB 1.0 rejects lateral column
-- parameters in generate_series
SELECT media_id, kind, CAST(f AS BIGINT) AS frame
FROM b, generate_series(0, 256) t(f)
WHERE kind = 'video' AND f < n AND f % {MEDIA_FRAME_EVERY} = 0
UNION ALL
SELECT media_id, kind, 0 FROM b WHERE kind <> 'video'
"""
