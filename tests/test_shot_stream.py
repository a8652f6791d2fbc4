"""Incremental shot segmentation stream (streaming/shot_stream): epoch
folds equal an independent pure-Python chain over the full sequence,
replayed epochs are no-ops at the watermark, late (behind-frontier)
frames drop rather than re-fold, and dead state generations are GC'd."""

from __future__ import annotations

import os

from purldb_spark.streaming.shot_stream import (
    BOUNDARY_E3,
    current_assignments,
    current_shots,
    segment_shots_batch,
)


def _frames(n_media: int):
    """Deterministic keyframe rows: media i has i % 9 + 3 frames with
    signature (1000 * ((i + 37 * k) % 256)) — jumps cross BOUNDARY_E3
    often, so chains have several shots."""
    rows = []
    for i in range(n_media):
        for k in range(i % 9 + 3):
            rows.append(
                {
                    "media_id": i,
                    "sample_no": k + 1,
                    "ts_ms": 10 * k,
                    "sig_e3": 1000 * ((i + 37 * k) % 256),
                }
            )
    return rows


def _expected_assignments(rows):
    """Independent chain fold: plain Python loop per media."""
    by_media: dict[int, list[dict]] = {}
    for r in sorted(rows, key=lambda r: (r["media_id"], r["sample_no"])):
        by_media.setdefault(r["media_id"], []).append(r)
    out = []
    for mid, seq in by_media.items():
        prev = None
        shot = 0
        for r in seq:
            if prev is None or abs(r["sig_e3"] - prev) > BOUNDARY_E3:
                shot += 1
            prev = r["sig_e3"]
            out.append((mid, r["sample_no"], r["ts_ms"], r["sig_e3"], shot))
    return sorted(out)


def _mk_df(spark, rows):
    return spark.createDataFrame(
        [(r["media_id"], r["sample_no"], r["ts_ms"], r["sig_e3"]) for r in rows],
        "media_id long, sample_no long, ts_ms long, sig_e3 long",
    )


def test_stream_matches_batch_chain(spark, tmp_path):
    d = str(tmp_path / "shots")
    rows = _frames(20)
    # split IN ORDER per media: epoch e carries sample_no in a range
    epochs = [
        [r for r in rows if r["sample_no"] <= 2],
        [r for r in rows if 2 < r["sample_no"] <= 5],
        [r for r in rows if r["sample_no"] > 5],
    ]
    for e, batch in enumerate(epochs):
        segment_shots_batch(spark, _mk_df(spark, batch), d, epoch_id=e)
    got = sorted(
        (r.media_id, r.sample_no, r.ts_ms, r.sig_e3, r.shot_id)
        for r in current_assignments(spark, d).collect()
    )
    assert got == _expected_assignments(rows)
    # rollup view: one row per (media, shot), frame counts add up
    shots = current_shots(spark, d).collect()
    assert sum(s.n_frames for s in shots) == len(rows)
    assert all(s.start_sample <= s.end_sample for s in shots)


def test_replayed_epoch_is_noop(spark, tmp_path):
    d = str(tmp_path / "shots")
    rows = _frames(8)
    e0 = [r for r in rows if r["sample_no"] <= 3]
    e1 = [r for r in rows if r["sample_no"] > 3]
    segment_shots_batch(spark, _mk_df(spark, e0), d, epoch_id=0)
    segment_shots_batch(spark, _mk_df(spark, e1), d, epoch_id=1)
    before = sorted(map(tuple, current_assignments(spark, d).collect()))
    # Structured Streaming replay: the same epoch fires again AFTER the
    # snapshot advanced — must not clobber its partition or re-fold
    segment_shots_batch(spark, _mk_df(spark, e0), d, epoch_id=0)
    segment_shots_batch(spark, _mk_df(spark, e1), d, epoch_id=1)
    after = sorted(map(tuple, current_assignments(spark, d).collect()))
    assert after == before


def test_late_frame_drops_not_refolds(spark, tmp_path):
    d = str(tmp_path / "shots")
    rows = _frames(5)
    segment_shots_batch(spark, _mk_df(spark, rows), d, epoch_id=0)
    before = sorted(map(tuple, current_assignments(spark, d).collect()))
    # a frame at/behind every frontier arrives in a later epoch: dropped
    late = [r for r in rows if r["sample_no"] == 1]
    segment_shots_batch(spark, _mk_df(spark, late), d, epoch_id=1)
    after = sorted(map(tuple, current_assignments(spark, d).collect()))
    assert after == before


def test_state_generation_gc(spark, tmp_path):
    d = str(tmp_path / "shots")
    rows = _frames(4)
    for e in range(3):
        batch = [r for r in rows if (r["sample_no"] - 1) // 3 == e]
        segment_shots_batch(spark, _mk_df(spark, batch), d, epoch_id=e)
    gens = [x for x in os.listdir(d) if x.startswith("gen=")]
    assert len(gens) == 1  # dead generations GC'd after each swap
    assert open(os.path.join(d, "CURRENT")).read() == gens[0].split("=")[1]


def test_continuing_shot_across_epochs(spark, tmp_path):
    """A shot spanning the epoch boundary keeps its id: constant
    signature over 4 frames split 2/2 must yield ONE shot."""
    d = str(tmp_path / "shots")
    rows = [
        {"media_id": 1, "sample_no": k, "ts_ms": k, "sig_e3": 5000}
        for k in range(1, 5)
    ]
    segment_shots_batch(spark, _mk_df(spark, rows[:2]), d, epoch_id=0)
    segment_shots_batch(spark, _mk_df(spark, rows[2:]), d, epoch_id=1)
    got = current_assignments(spark, d).collect()
    assert {r.shot_id for r in got} == {1}
    assert len(got) == 4


def test_real_stream_end_to_end(spark, tmp_path):
    """Actual Structured Streaming drive: parquet source -> foreachBatch
    shot_sink -> availableNow drain, twice — the streamed chain over two
    physical epochs equals the independent fold, and a full RESTART with
    the same checkpoint replays nothing."""
    from purldb_spark.streaming.shot_stream import shot_sink

    src = str(tmp_path / "incoming")
    d = str(tmp_path / "shots")
    ckpt = str(tmp_path / "ckpt")
    schema = "media_id long, sample_no long, ts_ms long, sig_e3 long"
    rows = _frames(10)

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.foreachBatch(shot_sink(spark, d))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    e0 = [r for r in rows if r["sample_no"] <= 4]
    e1 = [r for r in rows if r["sample_no"] > 4]
    _mk_df(spark, e0).write.mode("append").parquet(src)
    drain()
    _mk_df(spark, e1).write.mode("append").parquet(src)
    drain()
    got = sorted(
        (r.media_id, r.sample_no, r.ts_ms, r.sig_e3, r.shot_id)
        for r in current_assignments(spark, d).collect()
    )
    assert got == _expected_assignments(rows)
    # restart with nothing new: the drained checkpoint replays no epoch
    drain()
    after = sorted(
        (r.media_id, r.sample_no, r.ts_ms, r.sig_e3, r.shot_id)
        for r in current_assignments(spark, d).collect()
    )
    assert after == got
