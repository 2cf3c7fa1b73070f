"""Data layer: converters (L6) + RULER generators."""

import numpy as np

from magicdec_tpu.data import datasets as D
from magicdec_tpu.data.ruler import synthetic as R


def test_synthetic_dataset_shape_and_bos():
    d = D.synthetic_long_context_dataset(256, num_seqs=4, vocab_size=1000,
                                         bos_id=1)
    assert d.shape == (4, 256)
    assert (d[:, 0] == 1).all()
    assert d.dtype == np.int32


def test_pg19_fallback_to_synthetic(tmp_path):
    class Tok:
        vocab_size = 500
        bos_token_id = 2
    d = D.convert_pg19_dataset(Tok(), 128, data_dir=str(tmp_path / "missing"))
    assert d.shape[1] == 128 and (d[:, 0] == 2).all()


def test_pg19_real_json(tmp_path):
    import json

    class Tok:
        vocab_size = 500
        bos_token_id = 2
        def encode(self, text):
            return [min(ord(c), 499) for c in text]

    (tmp_path / "book1.json").write_text(json.dumps({"text": "ab" * 5000}))
    d = D.convert_pg19_dataset(Tok(), 64, data_dir=str(tmp_path),
                               drop_prefix=100, repeats=2)
    assert d.shape[1] == 64
    assert len(d) % 2 == 0 and len(d) > 0
    assert (d[:, 0] == 2).all()


def test_batch_iterator_drops_last():
    data = np.arange(70).reshape(10, 7)
    batches = list(D.batch_iterator(data, 4))
    assert len(batches) == 2 and batches[0].shape == (4, 7)


def test_ruler_niah_answer_present():
    rows = list(R.generate_niah(num_samples=3, context_words=200))
    for row in rows:
        for out in row["outputs"]:
            assert out in row["input"]
        assert R.score_row(row, " ".join(row["outputs"])) == 1.0
        assert R.score_row(row, "nothing") == 0.0


def test_ruler_variable_tracking_chain():
    rows = list(R.generate_variable_tracking(num_samples=2, context_words=150,
                                             num_hops=3))
    for row in rows:
        assert len(row["outputs"]) == 4
        for name in row["outputs"]:
            assert f"VAR {name}" in row["input"]


def test_ruler_cwe_and_fwe():
    for row in R.generate_common_words_extraction(num_samples=2):
        for w in row["outputs"]:
            assert row["input"].count(w) >= 10
    for row in R.generate_freq_words_extraction(num_samples=2):
        assert len(row["outputs"]) == 3


def test_ruler_write_jsonl(tmp_path):
    path = tmp_path / "niah.jsonl"
    n = R.write_jsonl("niah_single", str(path), num_samples=2,
                      context_words=100)
    assert n == 2
    import json
    rows = [json.loads(l) for l in path.read_text().splitlines()]
    assert all("input" in r and "outputs" in r for r in rows)


def test_ruler_qa_gold_among_distractors():
    rows = list(R.generate_qa(num_samples=4, context_words=240, doc_words=30, seed=1))
    assert len(rows) == 4
    for row in rows:
        [answer] = row["outputs"]
        assert answer in row["input"]          # gold fact present
        assert row["input"].count("Document [") == 8
        # the question names the gold entity and the answer scores 1.0
        assert R.score_row(row, f"the answer is {answer}") == 1.0
        assert R.score_row(row, "unrelated") == 0.0
