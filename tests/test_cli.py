"""End-to-end CLI smoke tests: train 2 steps + eval on tiny configs
(--tiny --version random), with AutoTokenizer monkeypatched to an offline
fake (no HF hub in this image)."""

import json
import os

import numpy as np
import pytest


class FakeHFTok:
    """Just enough of the HF tokenizer surface for the CLIs."""

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0
    pad_token = "<pad>"
    unk_token = "<unk>"
    model_max_length = 512

    def __init__(self):
        self.extra = {}

    def add_tokens(self, toks, special_tokens=False):
        for t in toks:
            if t not in self.extra:
                self.extra[t] = 400 + len(self.extra)
        return len(toks)

    def convert_tokens_to_ids(self, tok):
        return self.extra.get(tok, 3)

    def __len__(self):
        return 440

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{int(i)}" for i in np.atleast_1d(np.asarray(ids)))

    def batch_decode(self, batch, skip_special_tokens=True):
        return [self.decode(row) for row in batch]

    def __call__(self, text, add_special_tokens=True):
        text = text.replace("</s>", " </s> ")
        ids = [self.bos_token_id] if add_special_tokens else []
        for w in text.split():
            if w == "</s>":
                ids.append(2)
            elif w in self.extra:
                ids.append(self.extra[w])
            elif w.startswith("<SEG>"):
                ids.append(self.extra.get("<SEG>", 400))
            else:
                ids.append(5 + (hash(w) % 300))

        class R:
            pass

        r = R()
        r.input_ids = ids
        return r


@pytest.fixture()
def fake_tokenizer(monkeypatch):
    import transformers
    fake = FakeHFTok()
    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        staticmethod(lambda *_a, **_k: fake))
    return fake


@pytest.fixture()
def tiny_dataset(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.uniform(0, 255, (40, 50, 3)).astype(
            np.uint8)).save(tmp_path / f"im{i}.jpg")
        m = np.zeros((40, 50), np.uint8)
        m[8:20, 10:30] = 255
        Image.fromarray(m).save(tmp_path / f"m{i}.png")
    records = [{
        "image": f"im{i}.jpg",
        "conversations": [
            {"from": "human", "value": "<image>\nSegment the lesion."},
            {"from": "gpt", "value": f"<mask>m{i}.png</mask> It is <SEG> ."},
        ]} for i in range(2)]
    path = tmp_path / "train.json"
    json.dump(records, open(path, "w"))
    return str(path), str(tmp_path)


@pytest.mark.slow
def test_train_cli_two_steps(fake_tokenizer, tiny_dataset, tmp_path):
    from medplib_tpu.train import cli
    data_json, folder = tiny_dataset
    log_dir = str(tmp_path / "runs")
    cli.main([
        "--version", "random", "--tokenizer", "fake", "--tiny",
        "--dataset-json", data_json, "--image-folder", folder,
        "--exp-name", "smoke", "--log-base-dir", log_dir,
        "--epochs", "1", "--steps-per-epoch", "2", "--batch-size", "1",
        "--model-max-length", "96", "--warmup-steps", "1",
        "--save-steps", "2", "--log-steps", "1", "--precision", "fp32",
    ])
    run = os.path.join(log_dir, "smoke")
    assert os.path.isdir(run)
    # a checkpoint landed (orbax step dir or 'latest' marker)
    assert any("ckpt" in d or d == "latest" or d.isdigit()
               for d in os.listdir(run)), os.listdir(run)


def test_eval_cli_seg_mode(fake_tokenizer, tiny_dataset, tmp_path):
    from medplib_tpu.eval import cli
    data_json, folder = tiny_dataset
    answers = str(tmp_path / "ans.jsonl")
    metrics = str(tmp_path / "metrics.json")
    cli.main([
        "--version", "random", "--tokenizer", "fake", "--tiny",
        "--dataset-json", data_json, "--image-folder", folder,
        "--mode", "seg", "--batch-size", "1", "--max-new-tokens", "4",
        "--model-max-length", "96", "--precision", "fp32",
        "--answers-file", answers, "--metrics-file", metrics,
    ])
    assert os.path.exists(answers)
    rows = [json.loads(l) for l in open(answers)]
    assert len(rows) == 2
    assert os.path.exists(metrics)


def test_chat_cli_one_turn(fake_tokenizer, tiny_dataset, tmp_path,
                           monkeypatch):
    from medplib_tpu import chat
    _, folder = tiny_dataset
    img = os.path.join(folder, "im0.jpg")
    answers = iter(["Segment the lesion please", img])

    def fake_input(_prompt=""):
        try:
            return next(answers)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    vis = str(tmp_path / "vis")
    chat.main(["--checkpoint", "random", "--tokenizer", "fake", "--tiny",
               "--max-new-tokens", "4", "--precision", "fp32",
               "--vis-save-path", vis])
    # one REPL turn completed; with random weights a <SEG> may or may not be
    # emitted — the vis dir must exist, and if has_seg fired, overlays exist
    assert os.path.isdir(vis)
