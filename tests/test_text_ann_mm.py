"""Text analysis, ANN, and multimodal plumbing tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tenzir_ray import ann, multimodal, text


def test_token_counts_and_quality():
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["the cat and the dog", "x!!! ???", None],
        }
    )
    ds = ray.data.from_arrow(t)
    out = text.token_count(ds).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [5, 2, 0]
    out = text.bpe_token_count(ds).to_pandas().sort_values("doc_id")
    assert out["n_bpe_tokens"].tolist() == [5, 7, 0]
    q = text.quality_score(ds).to_pandas().sort_values("doc_id")
    assert q.loc[0, "quality"] > q.loc[1, "quality"]  # prose beats punctuation soup
    assert q.loc[0, "stop_ratio"] == pytest.approx(3 / 5)


def test_lang_id():
    t = pa.table(
        {
            "doc_id": [0, 1],
            "text": [
                "the cat is in the house and it is warm for now",
                "der Hund ist nicht in der Wohnung und das ist gut",
            ],
        }
    )
    out = text.lang_id(ray.data.from_arrow(t), concurrency=1).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist() == ["en", "de"]


def test_fingerprint_order_invariant():
    t = pa.table({"doc_id": [0, 1], "text": ["b a c", "c b a"]})
    out = text.fingerprint(ray.data.from_arrow(t)).to_pandas()
    assert out["fingerprint"].nunique() == 1  # word-order invariant


def _emb_ds(n=64, dim=8, seed=9):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    t = pa.table(
        {
            "vec_id": list(range(n)),
            "embedding": pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(t).repartition(4), vecs


def test_knn_brute_matches_numpy():
    ds, vecs = _emb_ds()
    q = vecs[3]
    out = ann.knn_brute(ds, q, k=5)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    expect = np.argsort(-(norm @ (q / np.linalg.norm(q))))[:5]
    assert out[out.query_id == 0]["vec_id"].tolist() == expect.tolist()
    assert out.iloc[0]["vec_id"] == 3 and out.iloc[0]["score"] == pytest.approx(1.0)


def test_knn_ivf_recall():
    ds, vecs = _emb_ds(n=128)
    q = vecs[7]
    exact = set(ann.knn_brute(ds, q, k=5)["vec_id"])
    approx = ann.knn_ivf(ds, q, k=5, n_lists=8, nprobe=4)
    got = set(approx[approx.query_id == 0]["vec_id"])
    assert 7 in got  # the vector itself must be found
    assert len(exact & got) >= 3  # decent recall with nprobe=half


def test_multimodal_image_pipeline():
    payloads = [multimodal.make_fake_image(32, 16, seed=i) for i in range(6)]
    t = pa.table({"img_id": list(range(6)), "data": pa.array(payloads, type=pa.binary())})
    ds = ray.data.from_arrow(t)
    dec = multimodal.decode_images(ds, concurrency=1).to_pandas().sort_values("img_id")
    assert dec["width"].tolist() == [32] * 6 and dec["height"].tolist() == [16] * 6
    assert dec["pixels_sha256"].nunique() == 6

    resized = multimodal.resize_images(ds, target=8, concurrency=1)
    dec2 = multimodal.decode_images(resized, concurrency=1).to_pandas()
    assert dec2["width"].tolist() == [8] * 6


def test_multimodal_audio_and_stubs():
    payloads = [multimodal.make_fake_audio(16000, seed=i) for i in range(3)]
    t = pa.table({"aud_id": [0, 1, 2], "data": pa.array(payloads, type=pa.binary())})
    out = multimodal.audio_features(ray.data.from_arrow(t), concurrency=1).to_pandas()
    assert (out["duration_sec"] == 1.0).all()
    assert (out["rms"] > 0).all()

    with pytest.raises(NotImplementedError, match="image library"):
        multimodal.ImageDecode(codec="jpeg")
    with pytest.raises(NotImplementedError, match="video library"):
        multimodal.VideoFrameSample(codec="h264")


def test_ivf_save_load_query(tmp_path):
    """Persisted IVF: save writes hive-partitioned lists, load skips
    re-fit, a saved query with nprobe == n_lists equals brute force,
    and a pruned query reads only the probed partitions."""
    import os

    ds, vecs = _emb_ds(n=128)
    idx = ann.IVFIndex.fit(ds, "embedding", n_lists=8)
    path = str(tmp_path / "ivf")
    idx.save(path, ds)
    parts = sorted(os.listdir(os.path.join(path, "vectors")))
    assert all(p.startswith("__ivf_list=") for p in parts) and len(parts) >= 2

    loaded = ann.IVFIndex.load(path)
    assert np.allclose(loaded.centroids, idx.centroids)

    q = vecs[7]
    exact = ann.knn_brute(ds, q, k=5)
    saved = ann.knn_ivf_saved(path, q, k=5, nprobe=8)
    assert saved["vec_id"].tolist() == exact["vec_id"].tolist()

    # pruned path: only the probed partitions load
    probe = np.argsort(-(ann._normalize(np.atleast_2d(q)) @ loaded.centroids.T), axis=1)[:, :2]
    pruned = ann.read_ivf_lists(path, probe.ravel())
    assert pruned.count() < 128
    got = set(ann.knn_ivf_saved(path, q, k=5, nprobe=2)["vec_id"])
    assert 7 in got


def test_video_frame_sampling():
    vids = [multimodal.make_fake_video(17, seed=i) for i in range(3)]
    t = pa.table({"video_id": [0, 1, 2], "data": pa.array(vids, type=pa.binary())})
    out = (
        multimodal.sample_video_frames(ray.data.from_arrow(t), every_n=5, concurrency=1)
        .to_pandas().sort_values(["video_id", "frame_index"]).reset_index(drop=True)
    )
    # 17 frames, every 5th -> indexes 0,5,10,15 per video
    assert out["frame_index"].tolist() == [0, 5, 10, 15] * 3
    assert out["ts_sec"].iloc[1] == 5 / 30
    # sampled frames decode like images
    dec = multimodal.decode_images(
        ray.data.from_arrow(pa.Table.from_pandas(out[["video_id", "data"]])), concurrency=1
    ).to_pandas()
    assert dec["width"].tolist() == [32] * 12

    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.VideoFrameSample(codec="h264")
