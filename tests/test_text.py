import numpy as np

from dc_tts_tpu.config import base_config
from dc_tts_tpu import text as T


CFG = base_config()


def test_vocab_roundtrip():
    c2i, i2c = T.load_vocab(CFG)
    assert c2i["P"] == 0 and c2i["E"] == 1
    assert len(c2i) == 32
    assert all(i2c[c2i[ch]] == ch for ch in CFG.vocab)


def test_normalize_accents_case_oov():
    # NFD accent stripping + lowercase + out-of-vocab -> space + collapse
    assert T.text_normalize("Café!", CFG) == "cafe "
    assert T.text_normalize("Héllo  WORLD?", CFG) == "hello world?"
    assert T.text_normalize("it's fine.", CFG) == "it's fine."


def test_encode_appends_eos():
    ids = T.encode_text("ab", CFG)
    assert ids[-1] == 1  # E
    assert ids.dtype == np.int32


def test_encode_batch_padding():
    batch = T.encode_batch(["hi", "a longer sentence here"], CFG)
    assert batch.shape == (2, CFG.max_N)
    assert batch.dtype == np.int32
    row = batch[0]
    n = np.flatnonzero(row)[-1]
    assert row[n] == 1  # last nonzero is EOS
    assert (row[n + 1:] == 0).all()  # zero pad after EOS


def test_encode_batch_truncates_with_eos():
    long = "a" * 500
    batch = T.encode_batch([long], CFG)
    assert batch.shape == (1, CFG.max_N)
    assert batch[0, -1] == 1


def test_load_test_sentences(tmp_path):
    p = tmp_path / "sents.txt"
    p.write_text("HEADER LINE\n1. First one.\n2. Second one.\n")
    sents = T.load_test_sentences(str(p))
    assert sents == ["First one.", "Second one."]
