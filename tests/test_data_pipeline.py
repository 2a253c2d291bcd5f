"""Data pipeline: shards/manifest round-trip, tokenizer+collater, bucketing
invariants, prefix-mode-4 prompts, and loader -> train-step integration."""

import numpy as np
import pytest

from valle_tpu import macros
from valle_tpu.data import (
    CodeShardWriter,
    Manifest,
    SymbolTable,
    TextTokenCollater,
    TextTokenizer,
    TtsDataLoader,
    get_text_token_collater,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.RandomState(0)
    tok = TextTokenizer(backend="chars")
    texts = [
        "hello world",
        "this is a test",
        "the quick brown fox",
        "jumps over the lazy dog",
        "speech synthesis",
        "neural codec language models",
        "zero shot text to speech",
        "twenty five utterances of data",
    ]
    records = []
    symbols = set()
    with CodeShardWriter(root) as w:
        for spk in range(3):
            for k, text in enumerate(texts):
                utt_id = f"{spk}_{100 + spk}_{k:06d}_{0:06d}"  # libritts-like
                dur = float(rng.uniform(1.0, 6.0))
                t = int(dur * macros.AUDIO_FRAME_RATE)
                codes = rng.randint(0, 1024, (t, 8))
                shard, key = w.write(utt_id, codes)
                tokens = tok([text])[0]
                symbols.update(tokens)
                records.append(
                    {
                        "id": utt_id,
                        "text": text,
                        "tokens": tokens,
                        "duration": dur,
                        "shard": shard,
                        "key": key,
                    }
                )
    Manifest.save(iter(records), root / "manifest_train.jsonl.gz")
    table = SymbolTable()
    for s in sorted(symbols):
        table.add(s)
    table.to_file(root / "unique_text_tokens.k2symbols")
    return root


def test_manifest_roundtrip(corpus):
    m = Manifest.load(corpus / "manifest_train.jsonl.gz")
    assert len(m) == 24
    assert m.uses_vshards()
    codes = m.codes(0)
    assert codes.shape[1] == 8
    assert "Cuts count: 24" in m.describe()


def test_h5_shard_compat(tmp_path):
    """Legacy HDF5 shards still load through the same Manifest surface."""
    h5py = pytest.importorskip("h5py")  # noqa: F841
    rng = np.random.RandomState(1)
    records = []
    with CodeShardWriter(tmp_path, fmt="h5") as w:
        for i in range(4):
            codes = rng.randint(0, 1024, (rng.randint(30, 90), 8))
            shard, key = w.write(f"utt{i}", codes)
            records.append(
                {"id": f"utt{i}", "text": "", "tokens": ["a"],
                 "duration": codes.shape[0] / macros.AUDIO_FRAME_RATE,
                 "shard": shard, "key": key, "_codes": codes}
            )
    Manifest.save(
        iter([{k: v for k, v in r.items() if k != "_codes"} for r in records]),
        tmp_path / "manifest_train.jsonl.gz",
    )
    m = Manifest.load(tmp_path / "manifest_train.jsonl.gz")
    assert not m.uses_vshards()
    for i, r in enumerate(records):
        assert np.array_equal(m.codes(i), r["_codes"])


def test_native_matches_numpy_fallback(corpus, monkeypatch):
    """The C++ gather_pad and the numpy loop produce identical batches."""
    from valle_tpu.data import native_loader
    from valle_tpu.data.bucketing import BucketSpec
    from valle_tpu.data.dataset import SpeechSynthesisDataset

    if not native_loader.available():
        pytest.skip("no C++ toolchain")
    m = Manifest.load(corpus / "manifest_train.jsonl.gz")
    collater = get_text_token_collater(str(corpus / "unique_text_tokens.k2symbols"))
    ds_native = SpeechSynthesisDataset(m, collater)
    assert ds_native._native is not None
    monkeypatch.setattr(native_loader, "available", lambda: False)
    ds_numpy = SpeechSynthesisDataset(
        Manifest.load(corpus / "manifest_train.jsonl.gz"), collater
    )
    assert ds_numpy._native is None
    spec = BucketSpec(max_text_len=32, max_audio_len=160)
    idx = [0, 3, 7, 11, 23]
    bn = ds_native.batch(spec, idx)
    bp = ds_numpy.batch(spec, idx)
    assert np.array_equal(bn["audio_features"], bp["audio_features"])
    assert np.array_equal(bn["audio_features_lens"], bp["audio_features_lens"])


def test_prefetcher(corpus):
    from valle_tpu.data.dataset import Prefetcher

    m = Manifest.load(corpus / "manifest_train.jsonl.gz")
    collater = get_text_token_collater(str(corpus / "unique_text_tokens.k2symbols"))
    loader = TtsDataLoader(m, collater, max_duration=8.0, num_buckets=2, seed=3)
    loader.set_epoch(0)
    direct = [tuple(u for row in b["utt_id"] for u in row) for b in loader]
    prefetched = [
        tuple(u for row in b["utt_id"] for u in row)
        for b in Prefetcher(iter(loader))
    ]
    assert direct == prefetched

    def boom():
        yield {"utt_id": [["x"]]}
        raise RuntimeError("worker failed")

    it = iter(Prefetcher(boom()))
    next(it)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(it)


def test_symbol_table_roundtrip(corpus):
    t = SymbolTable.from_file(corpus / "unique_text_tokens.k2symbols")
    assert "<eps>" in t
    s = t.symbols[1]
    assert t[t[s]] == s


def test_collater(corpus):
    collater = get_text_token_collater(str(corpus / "unique_text_tokens.k2symbols"))
    tok = TextTokenizer(backend="chars")
    ids, lens = collater.index(tok(["hello world", "test"]))
    assert ids.shape[0] == 2
    assert lens[0] == ids.shape[1]  # longest includes bos/eos
    assert ids[0, 0] == collater.token2idx["<bos>"]
    assert ids[0, lens[0] - 1] == collater.token2idx["<eos>"]


def test_bucketing_and_batches(corpus):
    m = Manifest.load(corpus / "manifest_train.jsonl.gz")
    collater = get_text_token_collater(str(corpus / "unique_text_tokens.k2symbols"))
    loader = TtsDataLoader(
        m, collater, max_duration=10.0, num_buckets=3, accum_steps=1, seed=7
    )
    loader.set_epoch(0)
    batches = list(loader)
    assert batches, "no batches produced"
    seen = set()
    for b in batches:
        a, bs, t, q = b["audio_features"].shape
        assert a == 1 and q == 8 and t % 16 == 0
        assert b["text_tokens"].shape[2] % 16 == 0
        # batch duration budget respected
        assert b["audio_features_lens"].sum() / macros.AUDIO_FRAME_RATE <= 10.0 + 6.0
        seen.update(u for row in b["utt_id"] for u in row)
    # shuffling differs across epochs
    loader.set_epoch(1)
    batches2 = list(loader)
    ids1 = [tuple(u for row in b["utt_id"] for u in row) for b in batches]
    ids2 = [tuple(u for row in b["utt_id"] for u in row) for b in batches2]
    assert ids1 != ids2


def test_resume_state(corpus):
    m = Manifest.load(corpus / "manifest_train.jsonl.gz")
    collater = get_text_token_collater(str(corpus / "unique_text_tokens.k2symbols"))
    loader = TtsDataLoader(m, collater, max_duration=8.0, num_buckets=2, seed=3)
    loader.set_epoch(0)
    it = iter(loader)
    first = next(it)
    state = loader.state_dict()
    rest = [b["utt_id"] for b in it]

    loader2 = TtsDataLoader(m, collater, max_duration=8.0, num_buckets=2, seed=3)
    loader2.set_epoch(0)
    loader2.load_state_dict(state)
    resumed = [b["utt_id"] for b in loader2]
    assert [tuple(map(tuple, r)) for r in rest] == [
        tuple(map(tuple, r)) for r in resumed
    ]


def test_multihost_resume_group_equalization(corpus):
    """Mid-epoch resume on a 2-host world: every rank must yield the same
    number of groups as the others AND the resumed streams must continue
    exactly where the uninterrupted runs left off (group boundaries are
    reconstructed by replay, not shifted by fresh pending buffers)."""
    m = Manifest.load(corpus / "manifest_train.jsonl.gz")
    collater = get_text_token_collater(
        str(corpus / "unique_text_tokens.k2symbols")
    )
    mk = lambda r: TtsDataLoader(
        m, collater, max_duration=8.0, num_buckets=2, accum_steps=2,
        seed=3, rank=r, world_size=2,
    )
    full = {}
    for r in (0, 1):
        ld = mk(r)
        ld.set_epoch(0)
        full[r] = [b["utt_id"] for b in ld]
    assert len(full[0]) == len(full[1]) >= 2, "need >=2 equalized groups"

    # consume one group on each rank, save rank-0's state (what the primary
    # writes into the checkpoint), resume BOTH ranks from it
    states = {}
    for r in (0, 1):
        ld = mk(r)
        ld.set_epoch(0)
        it = iter(ld)
        next(it)
        states[r] = ld.state_dict()
    assert states[0] == states[1], "group count must be rank-invariant"
    for r in (0, 1):
        ld2 = mk(r)
        ld2.set_epoch(0)
        ld2.load_state_dict(states[0])
        resumed = [b["utt_id"] for b in ld2]
        want = full[r][1:]
        assert len(resumed) == len(want), f"rank {r}: unequal group count"
        assert [tuple(map(tuple, g)) for g in resumed] == [
            tuple(map(tuple, g)) for g in want
        ], f"rank {r}: resumed stream diverged"


def test_mode4_prompts(corpus):
    m = Manifest.load(corpus / "manifest_train.jsonl.gz")
    collater = get_text_token_collater(str(corpus / "unique_text_tokens.k2symbols"))
    loader = TtsDataLoader(
        m,
        collater,
        max_duration=12.0,
        num_buckets=2,
        accum_steps=2,
        dataset_name="libritts",
        seed=5,
    )
    loader.set_epoch(0)
    got = False
    for b in loader:
        got = True
        a, bs, p, q = b["prompt_codes"].shape
        assert a == 2 and q == 8
        assert p <= 3 * macros.AUDIO_FRAME_RATE
        assert (b["prompt_codes_lens"] == p).all()
    assert got


def test_loader_feeds_train_step(corpus):
    import jax
    import jax.numpy as jnp

    from valle_tpu.models import ModelConfig, VALLE
    from valle_tpu.optim import scaled_adam
    from valle_tpu.train.step import init_train_state, make_train_step

    m = Manifest.load(corpus / "manifest_train.jsonl.gz")
    collater = get_text_token_collater(str(corpus / "unique_text_tokens.k2symbols"))
    loader = TtsDataLoader(m, collater, max_duration=8.0, num_buckets=1, seed=1)
    loader.set_epoch(0)
    batch = next(iter(loader))
    batch = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k not in ("utt_id", "text")
    }

    cfg = ModelConfig(
        decoder_dim=64,
        nhead=4,
        num_layers=2,
        num_quantizers=8,
        num_text_tokens=max(collater.vocab_size, 512),
    )
    model = VALLE(cfg)
    tx = scaled_adam(learning_rate=0.01, clipping_scale=None)
    state = init_train_state(
        model, tx, jax.random.PRNGKey(0), jax.tree.map(lambda x: x[0], batch)
    )
    step = make_train_step(model, tx, lambda s, e: 0.01)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))
    assert np.isfinite(float(metrics["loss"]))
