"""M3 siamese scorer (operators/siamese.py) — architecture parity with
OntoEmmaNN (ontoemma_model.py:73-164, config/ontoemma_nn_all.json)."""

import numpy as np
import pytest

from ontoemma_spark.operators.siamese import (
    CHAR_NGRAMS,
    DECISION_IN,
    ENC_DIM,
    HIDDEN,
    TOKEN_DIM,
    WORD_DIM,
    LSTMLayer,
    SiameseScorer,
    score_pairs_siamese,
)

FEATS = [f"f{i}" for i in range(32)]


@pytest.fixture(scope="module")
def model():
    return SiameseScorer.seeded(FEATS, seed=11)


def _inputs(n):
    rng = np.random.RandomState(3)
    eng = rng.uniform(0, 1, size=(n, 32))
    s_names = [f"alpha beta entity {i}" for i in range(n)]
    t_names = [f"alpha gamma entity {i}" for i in range(n)]
    s_al = [[f"alpha beta {i}", "syn one"] for i in range(n)]
    t_al = [[f"alpha gamma {i}"] for i in range(n)]
    s_def = [f"definition of thing {i} with several words" for i in range(n)]
    t_def = ["" for _ in range(n)]
    return eng, s_names, t_names, s_al, t_al, s_def, t_def


def test_forward_shapes_and_range(model):
    args = _inputs(5)
    scores = model.forward(*args)
    assert scores.shape == (5,)
    assert np.all((scores > 0) & (scores < 1))


def test_forward_deterministic(model):
    args = _inputs(4)
    a = model.forward(*args)
    b = SiameseScorer.seeded(FEATS, seed=11).forward(*args)
    assert np.allclose(a, b, atol=0)


def test_batch_equals_single(model):
    """Padding/masking must not leak across rows: scoring a batch gives
    the same numbers as scoring each pair alone (different batches pad
    to different T — the mask discipline is what this pins)."""
    eng, sn, tn, sa, ta, sd, td = _inputs(4)
    batch = model.forward(eng, sn, tn, sa, ta, sd, td)
    for i in range(4):
        single = model.forward(
            eng[i:i + 1], sn[i:i + 1], tn[i:i + 1],
            sa[i:i + 1], ta[i:i + 1], sd[i:i + 1], td[i:i + 1],
        )
        assert abs(batch[i] - single[0]) < 1e-12, i


def test_lstm_mask_final_state():
    """The final state is the last REAL step's state — right-padding a
    sequence must not change it (torch packed-sequence semantics)."""
    rng = np.random.RandomState(0)
    s = 0.2
    layer = LSTMLayer(
        rng.uniform(-s, s, (4 * HIDDEN, 8)),
        rng.uniform(-s, s, (4 * HIDDEN, HIDDEN)),
        rng.uniform(-s, s, 4 * HIDDEN),
        rng.uniform(-s, s, 4 * HIDDEN),
    )
    X = rng.normal(size=(1, 3, 8))
    _, h_short = layer.run(X, np.ones((1, 3)))
    X_pad = np.concatenate([X, np.zeros((1, 2, 8))], axis=1)
    mask = np.array([[1.0, 1.0, 1.0, 0.0, 0.0]])
    _, h_pad = layer.run(X_pad, mask)
    assert np.allclose(h_short, h_pad, atol=1e-15)
    # reverse direction: padded steps are skipped before the real ones
    _, hb_short = layer.run(X, np.ones((1, 3)), reverse=True)
    _, hb_pad = layer.run(X_pad, mask, reverse=True)
    assert np.allclose(hb_short, hb_pad, atol=1e-15)


def test_max_sim_matches_bruteforce(model):
    rng = np.random.RandomState(1)
    S = [rng.normal(size=(3, ENC_DIM)), rng.normal(size=(1, ENC_DIM))]
    T = [rng.normal(size=(2, ENC_DIM)), rng.normal(size=(4, ENC_DIM))]
    best_s, best_t = SiameseScorer._max_sim(S, T)
    for r in range(2):
        best = None
        for i in range(S[r].shape[0]):
            for j in range(T[r].shape[0]):
                d = float(S[r][i] @ T[r][j])
                if best is None or d > best[0]:
                    best = (d, i, j)
        assert np.allclose(best_s[r], S[r][best[1]])
        assert np.allclose(best_t[r], T[r][best[2]])


def test_encoder_output_dims(model):
    enc = model.encode_names(["cardiac muscle", "lung"])
    assert enc.shape == (2, ENC_DIM)
    d = model.encode_defs(["some definition text"])
    assert d.shape == (1, ENC_DIM)


def test_identical_entities_give_identical_siamese_outputs(model):
    """Siamese property: the same entity on both sides encodes to the
    same vector → decision input is symmetric-by-construction."""
    names = ["heart attack"]
    aliases = [["heart attack", "myocardial infarction"]]
    defs = ["necrosis of heart muscle"]
    s_enc = model.encode_names(names)
    t_enc = model.encode_names(names)
    assert np.allclose(s_enc, t_enc, atol=0)
    best_s, best_t = SiameseScorer._max_sim(
        model._encode_alias_lists(aliases), model._encode_alias_lists(aliases)
    )
    assert np.allclose(best_s, best_t, atol=0)
    _ = defs  # defs symmetry follows from encode_defs determinism


def test_from_allennlp_state_roundtrip():
    """A synthetic state_dict with the reference's parameter names and
    torch shapes loads and produces finite scores; the char-CNN conv
    layout (F, C, n) is transposed correctly (pinned by comparing one
    token against a direct conv1d computation)."""
    rng = np.random.RandomState(5)
    state = {}
    for prefix, in_dim in (("name_encoder._module", TOKEN_DIM),
                           ("definition_encoder._module", WORD_DIM)):
        for layer in range(2):
            d = in_dim if layer == 0 else 2 * HIDDEN
            for suffix in ("", "_reverse"):
                state[f"{prefix}.weight_ih_l{layer}{suffix}"] = rng.normal(0, 0.05, (4 * HIDDEN, d))
                state[f"{prefix}.weight_hh_l{layer}{suffix}"] = rng.normal(0, 0.05, (4 * HIDDEN, HIDDEN))
                state[f"{prefix}.bias_ih_l{layer}{suffix}"] = rng.normal(0, 0.05, 4 * HIDDEN)
                state[f"{prefix}.bias_hh_l{layer}{suffix}"] = rng.normal(0, 0.05, 4 * HIDDEN)
    cnn = "name_embedder.token_embedder_token_characters._encoder._module"
    for idx, n in enumerate(CHAR_NGRAMS):
        state[f"{cnn}.conv_layer_{idx}.weight"] = rng.normal(0, 0.1, (50, 100, n))
        state[f"{cnn}.conv_layer_{idx}.bias"] = rng.normal(0, 0.1, 50)
    dims = [(600, 100), (100, 100)]
    for i, (i_d, o_d) in enumerate(dims):
        state[f"siamese_feedforward._linear_layers.{i}.weight"] = rng.normal(0, 0.05, (o_d, i_d))
        state[f"siamese_feedforward._linear_layers.{i}.bias"] = rng.normal(0, 0.05, o_d)
    for i, (i_d, o_d) in enumerate([(DECISION_IN, DECISION_IN), (DECISION_IN, 1)]):
        state[f"decision_feedforward._linear_layers.{i}.weight"] = rng.normal(0, 0.05, (o_d, i_d))
        state[f"decision_feedforward._linear_layers.{i}.bias"] = rng.normal(0, 0.05, o_d)

    m = SiameseScorer.from_allennlp_state(state, FEATS)
    scores = m.forward(*_inputs(2))
    assert scores.shape == (2,) and np.all(np.isfinite(scores))

    # conv layout check: matmul form == direct torch-style conv1d
    tok = "abcdef"
    E = np.stack([m.char_cnn.chars(c) for c in tok])  # (L, C)
    n = CHAR_NGRAMS[0]
    W = state[f"{cnn}.conv_layer_0.weight"]  # (F, C, n)
    b = state[f"{cnn}.conv_layer_0.bias"]
    direct = np.stack([
        np.maximum((W * E[i:i + n].T[None, :, :]).sum(axis=(1, 2)) + b, 0.0)
        for i in range(len(tok) - n + 1)
    ]).max(axis=0)
    got = m.char_cnn.encode_token(tok)[:50]
    assert np.allclose(got, direct, atol=1e-12)


def test_score_pairs_siamese_spark(spark, model):
    import pyspark.sql.functions as F

    rows = [
        ("S:1", "T:1", "heart attack", "heart attack",
         ["heart attack"], ["heart attack", "mi"],
         "necrosis of heart muscle", "necrosis of heart muscle tissue"),
        ("S:2", "T:2", "renal failure", "liver failure",
         ["renal failure"], ["liver failure"], "", ""),
    ]
    df = spark.createDataFrame(
        rows,
        "s_id string, t_id string, s_name string, t_name string,"
        " s_aliases array<string>, t_aliases array<string>,"
        " s_def string, t_def string",
    )
    for i, f in enumerate(FEATS):
        df = df.withColumn(f, F.lit(float(i) / 32.0))
    out = {r["s_id"]: r["score"] for r in score_pairs_siamese(df, model).collect()}
    assert set(out) == {"S:1", "S:2"}
    for v in out.values():
        assert 0.0 < v < 1.0
    # deterministic across runs
    out2 = {r["s_id"]: r["score"] for r in score_pairs_siamese(df, model).collect()}
    assert out == out2


def test_align_with_siamese_scorer(spark):
    """align(model=SiameseScorer) is a working end-to-end path: string
    equivalence still short-circuits, the rest scores through the
    siamese forward pass over the real 32 engineered features."""
    from ontoemma_spark.align import align
    from ontoemma_spark.datagen import synthetic_kb
    from ontoemma_spark.operators.features import FEATURE_NAMES

    s_ents, _ = synthetic_kb(spark, "S", n_entities=25)
    t_ents, _ = synthetic_kb(spark, "T", n_entities=25, id_offset=10)
    model = SiameseScorer.seeded(FEATURE_NAMES, seed=11)
    res = align(s_ents, t_ents, model=model, strategy="all", threshold=0.0)
    rows = res.scores.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["score"] <= 1.0


def test_state_export_round_trip():
    """seeded → to_allennlp_state (JSON-safe) → from_allennlp_state
    reproduces the forward pass bit-for-bit — one persistence format
    for seeded, exported, and reference-extracted weights."""
    import json

    m = SiameseScorer.seeded(FEATS, seed=11)
    blob = json.loads(json.dumps(m.to_allennlp_state()))  # through JSON
    state = {k: np.asarray(v, dtype=np.float64) for k, v in blob.items()}
    m2 = SiameseScorer.from_allennlp_state(state, FEATS)
    args = _inputs(3)
    assert np.allclose(m.forward(*args), m2.forward(*args), atol=0)


def test_pretrained_embedding_table_fixture(tmp_path):
    """A user with the reference's actual weights300.txt.gz drops it in
    at the load_word_embeddings seam: GloVe text format (space-sep,
    gzipped, optional word2vec header), float32 vectors, hashed OOV
    fallback — and scores shift accordingly (config/
    ontoemma_nn_all.json:22-87 pretrained_file)."""
    import gzip as _gz

    from ontoemma_spark.operators.siamese import (
        WORD_DIM,
        load_word_embeddings,
    )

    rng = np.random.RandomState(7)
    vocab = ["alpha", "beta", "gamma", "entity", "definition"]
    path = tmp_path / "weights300.txt.gz"
    with _gz.open(path, "wt", encoding="utf-8") as f:
        f.write(f"{len(vocab)} {WORD_DIM}\n")  # word2vec-style header
        for w in vocab:
            vec = rng.normal(0, 0.3, size=WORD_DIM)
            f.write(w + " " + " ".join(f"{v:.6f}" for v in vec) + "\n")

    words = load_word_embeddings(str(path))
    assert set(words.table) == set(vocab)
    assert words("alpha").shape == (WORD_DIM,)
    assert words("alpha").dtype == np.float32
    # OOV falls back to the deterministic hashed vector
    hashed = load_word_embeddings()
    assert np.allclose(words("zzz-oov"), hashed("zzz-oov"))
    assert not np.allclose(words("alpha"), hashed("alpha"))

    # inference end-to-end with the table: deterministic, and different
    # from the hashed-table scores for in-vocab names
    m_table = SiameseScorer.seeded(FEATS, seed=11, words=words)
    m_hash = SiameseScorer.seeded(FEATS, seed=11)
    args = _inputs(3)
    s1 = m_table.forward(*args)
    s2 = SiameseScorer.seeded(FEATS, seed=11, words=load_word_embeddings(str(path))).forward(*args)
    assert np.allclose(s1, s2)
    assert s1.shape == (3,)
    assert ((s1 >= 0) & (s1 <= 1)).all()
    assert not np.allclose(s1, m_hash.forward(*args))


def test_pretrained_embedding_table_rejects_bad_dims(tmp_path):
    import pytest as _pt

    from ontoemma_spark.operators.siamese import load_word_embeddings

    p = tmp_path / "bad.txt"
    p.write_text("word 0.1 0.2 0.3\n")
    with _pt.raises(ValueError, match="3 dims"):
        load_word_embeddings(str(p))


def test_load_allennlp_archive_all_layouts(tmp_path):
    """The torch seam, closed end-to-end: a synthetic reference-format
    checkpoint (AllenNLP parameter names, written as .npz, .json.gz,
    and a model.tar.gz-layout tar with weights.npz + config.json)
    loads through load_allennlp_archive and reproduces the source
    model's forward pass bit-for-bit; a tar carrying only a real
    weights.th raises the documented export instruction."""
    import gzip
    import json
    import tarfile

    from ontoemma_spark.operators.siamese import load_allennlp_archive

    m = SiameseScorer.seeded(FEATS, seed=11)
    state_np = {k: np.asarray(v, dtype=np.float64)
                for k, v in m.to_allennlp_state().items()}
    args = _inputs(3)
    want = m.forward(*args)

    npz = tmp_path / "weights.npz"
    np.savez(npz, **state_np)
    got = load_allennlp_archive(str(npz), FEATS).forward(*args)
    assert np.allclose(want, got, atol=0)

    jgz = tmp_path / "weights.json.gz"
    with gzip.open(jgz, "wb") as f:
        f.write(json.dumps(m.to_allennlp_state()).encode())
    got = load_allennlp_archive(str(jgz), FEATS).forward(*args)
    assert np.allclose(want, got, atol=0)

    # model.tar.gz layout: config.json + vocabulary/ + weights.npz
    tgz = tmp_path / "model.tar.gz"
    with tarfile.open(tgz, "w:gz") as tar:
        tar.add(npz, arcname="weights.npz")
        cfg = tmp_path / "config.json"
        cfg.write_text('{"model": {"type": "ontoemma_nn"}}')
        tar.add(cfg, arcname="config.json")
    got = load_allennlp_archive(str(tgz), FEATS).forward(*args)
    assert np.allclose(want, got, atol=0)

    # a real torch pickle cannot be read without torch: loud seam
    th_tar = tmp_path / "torch_only.tar.gz"
    with tarfile.open(th_tar, "w:gz") as tar:
        th = tmp_path / "weights.th"
        th.write_bytes(b"\x80\x02torchpickle")
        tar.add(th, arcname="weights.th")
    with pytest.raises(ValueError, match="np.savez"):
        load_allennlp_archive(str(th_tar), FEATS)
