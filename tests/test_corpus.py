"""Streamed corpus mode: manifest checkpoint/resume + error isolation."""

import json
import os

import numpy as np
import pytest

from nicetpu import api
from nicetpu.corpus import encode_corpus, mode_stats
from nicetpu.spec import codec


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        img = (rng.integers(0, 5, (10, 12, 1)) * 50 + rng.integers(0, 4, (10, 12, 3))).astype(np.uint8)
        p = tmp_path / f"img{i}.png"
        api.imwrite(str(p), img)
        paths.append(str(p))
    return paths, tmp_path


class TestCorpus:
    def test_encode_resume_and_isolation(self, corpus):
        paths, tmp = corpus
        bad = str(tmp / "missing.png")  # nonexistent: must be isolated
        out = str(tmp / "out")
        res = encode_corpus(paths[:2] + [bad], out, backend="spec")
        assert res.encoded == 2 and res.failed == 1

        # resume: already-done images skipped, remaining encoded
        res2 = encode_corpus(paths + [bad], out, backend="spec")
        assert res2.skipped == 2 and res2.encoded == 2 and res2.failed == 1

        with open(os.path.join(out, "manifest.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        assert sum(r["status"] == "ok" for r in recs) == 4
        assert sum(r["status"] == "error" for r in recs) == 2

        # outputs decode bit-exactly
        for r in recs:
            if r["status"] != "ok":
                continue
            with open(r["out"], "rb") as f:
                data = f.read()
            np.testing.assert_array_equal(api.decode(data), api.imread(r["path"]))


class TestModeStats:
    def test_stats_accounting(self):
        rng = np.random.default_rng(1)
        img = (rng.integers(0, 5, (12, 10, 1)) * 50 + rng.integers(0, 4, (12, 10, 3))).astype(np.uint8)
        plan = codec.tokenize(img)
        st = mode_stats(codec.histogram(plan))
        n_modes = st["back_ref"] + st["rgb"] + st["luma"] + st["small_diff"] + st["luma2"]
        assert n_modes == plan.valid[:, 0].sum()
        assert st["total_tokens"] == plan.valid.sum()


class TestRealCorpus:
    def test_real_photo_roundtrip_native_vs_spec(self):
        """Real photographic content (SURVEY §4: corpus round-trip on real
        images, not sinusoids): native and spec encoders byte-identical,
        both decoders bit-exact, on small crops of every corpus image."""
        from nicetpu.realcorpus import load_corpus

        corpus = load_corpus(max_dim=96)
        assert len(corpus) >= 4, "real corpus images missing from environment"
        for name, img in corpus:
            d_native = api.encode(img, backend="native")
            d_spec = api.encode(img, backend="spec")
            assert d_native == d_spec, name
            np.testing.assert_array_equal(
                api.decode(d_native, backend="native"), img, err_msg=name
            )
            np.testing.assert_array_equal(
                api.decode(d_native, backend="spec"), img, err_msg=name
            )
