"""egs recipe helpers: corpus-layout walkers produce correct TSV splits."""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
spec = importlib.util.spec_from_file_location(
    "make_tsv", REPO / "egs" / "shared" / "make_tsv.py"
)
make_tsv = importlib.util.module_from_spec(spec)
sys.modules["make_tsv"] = make_tsv
spec.loader.exec_module(make_tsv)


def _wav(path: Path):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(b"RIFF")


def test_ljspeech_split(tmp_path):
    root = tmp_path / "LJSpeech-1.1"
    lines = []
    for i in range(20):
        _wav(root / "wavs" / f"LJ{i:03d}.wav")
        lines.append(f"LJ{i:03d}|raw {i}|Normalized text {i}.")
    (root / "metadata.csv").write_text("\n".join(lines))
    out = tmp_path / "out"
    # patch the 12500/200 boundaries is unnecessary: 20 < 12500 -> all train
    make_tsv.ljspeech(root, out)
    train = (out / "train.tsv").read_text().strip().split("\n")
    assert len(train) == 20
    utt, wav, text = train[3].split("\t")
    assert utt == "LJ003" and wav.endswith("LJ003.wav")
    assert text == "Normalized text 3."


def test_libritts_parts_combine(tmp_path):
    root = tmp_path / "LibriTTS"
    for part, spk in (("train-clean-100", "19"), ("train-clean-360", "26"),
                      ("dev-clean", "84"), ("test-clean", "121")):
        w = root / part / spk / "5" / f"{spk}_5_000001_000000.wav"
        _wav(w)
        w.with_suffix(".normalized.txt").write_text("Hello.")
    out = tmp_path / "out"
    make_tsv.libritts(
        root,
        ["train-clean-100", "train-clean-360", "dev-clean", "test-clean"],
        out,
    )
    # both train parts combine into one train split (ref prepare.sh:84-110)
    assert len((out / "train.tsv").read_text().strip().split("\n")) == 2
    assert len((out / "dev.tsv").read_text().strip().split("\n")) == 1
    assert len((out / "test.tsv").read_text().strip().split("\n")) == 1


def test_aishell_transcript_join(tmp_path):
    root = tmp_path / "aishell"
    _wav(root / "wav" / "train" / "S0002" / "BAC009S0002W0122.wav")
    _wav(root / "wav" / "dev" / "S0724" / "BAC009S0724W0121.wav")
    _wav(root / "wav" / "train" / "S0002" / "NO_TRANSCRIPT.wav")
    (root / "transcript").mkdir(parents=True)
    (root / "transcript" / "aishell_transcript_v0.8.txt").write_text(
        "BAC009S0002W0122 广州 市 房地产\nBAC009S0724W0121 经济 学\n"
    )
    out = tmp_path / "out"
    make_tsv.aishell(root, out)
    train = (out / "train.tsv").read_text().strip().split("\n")
    assert len(train) == 1  # the wav without transcript is dropped
    assert train[0].split("\t")[2] == "广州市房地产"
    dev = (out / "dev.tsv").read_text().strip().split("\n")
    assert dev[0].split("\t")[0] == "BAC009S0724W0121"
