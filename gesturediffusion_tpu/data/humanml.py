"""HumanML3D / KIT text-to-motion datasets.

Functional parity surface with the reference stack
(reference: data_loaders/humanml/data/dataset.py — Text2MotionDatasetV2:207
(length-bucketed pointer, unit-length crops, z-norm, GloVe+POS tokens),
TextOnlyDataset:641, wrappers HumanML3D:721 / KIT:779 with dual
normalization: the training Mean/Std vs the frozen T2M evaluator's
mean/std; data_loaders/humanml/utils/word_vectorizer.py WordVectorizer).

On-disk layout (same as reference): <root>/{new_joint_vecs/*.npy,
texts/*.txt, Mean.npy, Std.npy, train.txt/val.txt/test.txt}.
The GloVe vectorizer is optional — only the frozen-evaluator path uses it.
"""

from __future__ import annotations

import os
import pickle
import random
from os.path import join as pjoin
from typing import Optional

import numpy as np

# --- GloVe word vectorizer (eval path) --------------------------------- #

POS_ENUMERATOR = {
    "VERB": 0, "NOUN": 1, "DET": 2, "ADP": 3, "NUM": 4, "AUX": 5,
    "PRON": 6, "ADJ": 7, "ADV": 8, "Loc_VIP": 9, "Body_VIP": 10,
    "Obj_VIP": 11, "Act_VIP": 12, "Desc_VIP": 13, "OTHER": 14,
}

VIP_DICT = {
    "Loc_VIP": ("left", "right", "clockwise", "counterclockwise",
                "anticlockwise", "forward", "back", "backward", "up",
                "down", "straight", "curve"),
    "Body_VIP": ("arm", "chin", "foot", "feet", "face", "hand", "mouth",
                 "leg", "waist", "eye", "knee", "shoulder", "thigh"),
    "Obj_VIP": ("stair", "dumbbell", "chair", "window", "floor", "car",
                "ball", "handrail", "baseball", "basketball"),
    "Act_VIP": ("walk", "run", "swing", "pick", "bring", "kick", "put",
                "squat", "throw", "hop", "dance", "jump", "turn",
                "stumble", "dance", "stop", "sit", "lift", "lower",
                "raise", "wash", "stand", "kneel", "stroll", "rub",
                "bend", "balance", "flap", "jog", "shuffle", "lean",
                "rotate", "spin", "spread", "climb"),
    "Desc_VIP": ("slowly", "carefully", "fast", "careful", "slow",
                 "quickly", "happy", "angry", "sad", "happily",
                 "angrily", "sadly"),
}


class WordVectorizer:
    """GloVe embedding + 15-way POS one-hot lookup
    (reference: word_vectorizer.py:46-79)."""

    def __init__(self, meta_root: str, prefix: str):
        # released asset layout: {prefix}_words.pkl (list of words),
        # {prefix}_idx.pkl (word -> row), {prefix}_data.npy (embeddings)
        with open(pjoin(meta_root, f"{prefix}_words.pkl"), "rb") as f:
            words = pickle.load(f)
        with open(pjoin(meta_root, f"{prefix}_idx.pkl"), "rb") as f:
            word2idx = pickle.load(f)
        vectors = np.load(pjoin(meta_root, f"{prefix}_data.npy"))
        self.word2vec = {w: vectors[word2idx[w]] for w in words}

    def _get_pos_ohot(self, pos: str) -> np.ndarray:
        pos_vec = np.zeros(len(POS_ENUMERATOR))
        pos_vec[POS_ENUMERATOR.get(pos, POS_ENUMERATOR["OTHER"])] = 1
        return pos_vec

    def __len__(self):
        return len(self.word2vec)

    def __getitem__(self, item: str):
        word, pos = item.split("/")
        if word in self.word2vec:
            word_vec = self.word2vec[word]
            vip_pos = None
            for key, values in VIP_DICT.items():
                if word in values:
                    vip_pos = key
                    break
            pos_vec = self._get_pos_ohot(vip_pos or pos)
        else:
            word_vec = self.word2vec.get("unk", np.zeros(300))
            pos_vec = self._get_pos_ohot("OTHER")
        return word_vec, pos_vec


# --- datasets ----------------------------------------------------------- #


class HashVectorizer:
    """GloVe-free stand-in: deterministic random embedding per token.

    For hermetic tests / smoke evals when the external GloVe files are
    absent — NOT metric-parity (use WordVectorizer with real GloVe data).
    """

    def __init__(self, word_size: int = 300):
        self.word_size = word_size

    def __getitem__(self, item: str):
        import hashlib

        word, pos = item.split("/")
        # stable digest, NOT hash(): the built-in is salted per process
        # (PYTHONHASHSEED), which would make the "deterministic"
        # embeddings differ between runs/hosts and metrics irreproducible
        seed = int.from_bytes(
            hashlib.md5(word.encode()).digest()[:4], "little"
        )
        rs = np.random.RandomState(seed)
        word_vec = rs.randn(self.word_size).astype(np.float32) * 0.1
        pos_vec = np.zeros(len(POS_ENUMERATOR), np.float32)
        pos_vec[POS_ENUMERATOR.get(pos, POS_ENUMERATOR["OTHER"])] = 1
        return word_vec, pos_vec


class Text2MotionDatasetV2:
    """Train/eval text-to-motion dataset (length-bucketed)."""

    def __init__(
        self,
        root: str,
        split: str = "train",
        *,
        dataset_name: str = "t2m",
        max_motion_length: int = 196,
        unit_length: int = 4,
        max_text_len: int = 20,
        mean: Optional[np.ndarray] = None,
        std: Optional[np.ndarray] = None,
        w_vectorizer: Optional[WordVectorizer] = None,
        rng: Optional[random.Random] = None,
    ):
        self.root = root
        self.dataset_name = dataset_name
        self.max_motion_length = max_motion_length
        self.unit_length = unit_length
        self.max_text_len = max_text_len
        self.w_vectorizer = w_vectorizer
        self.rng = rng or random.Random(0)
        self.max_length = 20
        self.pointer = 0
        min_motion_len = 40 if dataset_name == "t2m" else 24

        self.mean = mean if mean is not None else np.load(pjoin(root, "Mean.npy"))
        self.std = std if std is not None else np.load(pjoin(root, "Std.npy"))

        motion_dir = pjoin(root, "new_joint_vecs")
        text_dir = pjoin(root, "texts")
        with open(pjoin(root, f"{split}.txt")) as f:
            id_list = [line.strip() for line in f if line.strip()]

        data_dict = {}
        new_name_list, length_list = [], []
        for name in id_list:
            try:
                motion = np.load(pjoin(motion_dir, name + ".npy"))
            except FileNotFoundError:
                continue
            if len(motion) < min_motion_len or len(motion) >= 200:
                continue
            text_data, flag = [], False
            with open(pjoin(text_dir, name + ".txt")) as f:
                for line in f:
                    line_split = line.strip().split("#")
                    if len(line_split) < 4:
                        continue
                    caption = line_split[0]
                    tokens = line_split[1].split(" ")
                    f_tag = float(line_split[2]) if line_split[2] != "nan" else 0.0
                    to_tag = float(line_split[3]) if line_split[3] != "nan" else 0.0
                    text_dict = {"caption": caption, "tokens": tokens}
                    if f_tag == 0.0 and to_tag == 0.0:
                        flag = True
                        text_data.append(text_dict)
                    else:
                        n_motion = motion[int(f_tag * 20) : int(to_tag * 20)]
                        if len(n_motion) < min_motion_len or len(n_motion) >= 200:
                            continue
                        new_name = (
                            self.rng.choice("ABCDEFGHIJKLMNOPQRSTUVW")
                            + "_" + name
                        )
                        while new_name in data_dict:
                            new_name = (
                                self.rng.choice("ABCDEFGHIJKLMNOPQRSTUVW")
                                + "_" + name
                            )
                        data_dict[new_name] = {
                            "motion": n_motion,
                            "length": len(n_motion),
                            "text": [text_dict],
                        }
                        new_name_list.append(new_name)
                        length_list.append(len(n_motion))
            if flag:
                data_dict[name] = {
                    "motion": motion,
                    "length": len(motion),
                    "text": text_data,
                }
                new_name_list.append(name)
                length_list.append(len(motion))

        if not new_name_list:
            raise ValueError(f"no usable motions under {root} ({split})")
        name_list, length_list = zip(
            *sorted(zip(new_name_list, length_list), key=lambda x: x[1])
        )
        self.length_arr = np.array(length_list)
        self.data_dict = data_dict
        self.name_list = list(name_list)
        self.reset_max_len(self.max_length)

    @property
    def pose_dim(self) -> int:
        return int(self.mean.shape[-1])

    def reset_max_len(self, length: int):
        assert length <= self.max_motion_length
        self.pointer = int(np.searchsorted(self.length_arr, length))
        self.max_length = length

    def inv_transform(self, data):
        return data * self.std + self.mean

    def __len__(self):
        return len(self.data_dict) - self.pointer

    def __getitem__(self, item: int) -> dict:
        idx = self.pointer + item
        data = self.data_dict[self.name_list[idx]]
        motion, m_length = data["motion"], data["length"]
        text_data = self.rng.choice(data["text"])
        caption, tokens = text_data["caption"], text_data["tokens"]

        out: dict = {"text": caption}
        if self.w_vectorizer is not None:
            if len(tokens) < self.max_text_len:
                tokens = ["sos/OTHER"] + tokens + ["eos/OTHER"]
                sent_len = len(tokens)
                tokens = tokens + ["unk/OTHER"] * (
                    self.max_text_len + 2 - sent_len
                )
            else:
                tokens = tokens[: self.max_text_len]
                tokens = ["sos/OTHER"] + tokens + ["eos/OTHER"]
                sent_len = len(tokens)
            embs, ohs = zip(*(self.w_vectorizer[t] for t in tokens))
            out["word_embeddings"] = np.stack(embs).astype(np.float32)
            out["pos_one_hots"] = np.stack(ohs).astype(np.float32)
            out["sent_len"] = sent_len
            out["tokens"] = "_".join(tokens)

        # Crop the motion to a multiple of unit_length.  The eval
        # protocol (spec: reference dataset.py:324-334) rounds m_length
        # DOWN one extra unit with probability 1/3 when unit_length < 10
        # — a data-augmentation quirk that shapes the evaluator's input
        # distribution, so the probabilities must match exactly.
        n_units = m_length // self.unit_length
        if self.unit_length < 10 and self.rng.random() < 1.0 / 3.0:
            n_units -= 1
        m_length = n_units * self.unit_length
        start = self.rng.randint(0, len(motion) - m_length)
        motion = motion[start : start + m_length]

        motion = (motion - self.mean) / self.std
        if m_length < self.max_motion_length:
            motion = np.concatenate(
                [
                    motion,
                    np.zeros(
                        (self.max_motion_length - m_length, motion.shape[1])
                    ),
                ],
                axis=0,
            )
        out["motion"] = motion.astype(np.float32)
        out["length"] = int(m_length)
        return out


class MotionDatasetV2:
    """Motion-only windows for movement-encoder pretraining
    (reference: dataset.py:503)."""

    def __init__(self, root: str, split: str = "train",
                 window_size: int = 64, rng: Optional[random.Random] = None):
        self.window_size = window_size
        self.rng = rng or random.Random(0)
        self.mean = np.load(pjoin(root, "Mean.npy"))
        self.std = np.load(pjoin(root, "Std.npy"))
        motion_dir = pjoin(root, "new_joint_vecs")
        with open(pjoin(root, f"{split}.txt")) as f:
            id_list = [line.strip() for line in f if line.strip()]
        self.data, self.lengths = [], []
        for name in id_list:
            try:
                motion = np.load(pjoin(motion_dir, name + ".npy"))
            except FileNotFoundError:
                continue
            if motion.shape[0] < window_size:
                continue
            self.lengths.append(motion.shape[0] - window_size)
            self.data.append(motion)
        self.cumsum = np.cumsum([0] + self.lengths)

    def inv_transform(self, data):
        return data * self.std + self.mean

    def __len__(self):
        return int(self.cumsum[-1])

    def __getitem__(self, item):
        if item != 0:
            motion_id = int(np.searchsorted(self.cumsum, item) - 1)
            idx = item - self.cumsum[motion_id] - 1
        else:
            motion_id, idx = 0, 0
        motion = self.data[motion_id][idx : idx + self.window_size]
        return {"motion": ((motion - self.mean) / self.std).astype(np.float32),
                "length": self.window_size}


class Text2MotionDatasetBaseline(Text2MotionDatasetV2):
    """Variant feeding the Guo baseline generator: adds a cropped source
    motion at max_length (reference: dataset.py:349)."""

    def __getitem__(self, item):
        out = super().__getitem__(item)
        motion = out["motion"]
        m_length = out["length"]
        if m_length >= self.max_length:
            src = motion[: self.max_length]
        else:
            src = motion[:m_length]
            pad = np.zeros(
                (self.max_length - m_length, motion.shape[1]), np.float32
            )
            src = np.concatenate([src, pad], axis=0)
        out["src_motion"] = src.astype(np.float32)
        return out


class RawTextDataset:
    """User prompts from a text file, POS-tagged for the evaluators
    (reference: dataset.py:576 — spacy tagging; falls back to OTHER tags
    when spacy/models are unavailable)."""

    def __init__(self, text_file: str, mean=None, std=None,
                 w_vectorizer=None, max_text_len: int = 20):
        self.mean, self.std = mean, std
        self.w_vectorizer = w_vectorizer
        self.max_text_len = max_text_len
        try:
            import spacy

            self.nlp = spacy.load("en_core_web_sm")
        except Exception:
            self.nlp = None
            import warnings

            warnings.warn(
                "spacy (en_core_web_sm) unavailable — POS-tagging every "
                "prompt token as OTHER.  Evaluator text embeddings will "
                "silently degrade vs the reference protocol; install the "
                "model for metric parity.",
                stacklevel=2,
            )
        self.data_dict = []
        with open(text_file) as f:
            for line in f:
                caption = line.strip()
                if not caption:
                    continue
                tokens = self.process_text(caption)
                self.data_dict.append(
                    {"caption": caption,
                     "tokens": [f"{w}/{p}" for w, p in tokens]}
                )

    def process_text(self, sentence: str):
        sentence = sentence.replace("-", "")
        if self.nlp is None:
            return [(w, "OTHER") for w in sentence.lower().split()]
        doc = self.nlp(sentence)
        out = []
        for token in doc:
            word = token.text
            if not word.isalpha():
                continue
            if token.pos_ in ("NOUN", "VERB") and word != "left":
                out.append((token.lemma_, token.pos_))
            else:
                out.append((word, token.pos_))
        return out

    def __len__(self):
        return len(self.data_dict)

    def __getitem__(self, item):
        entry = self.data_dict[item]
        out = {"text": entry["caption"], "tokens": "_".join(entry["tokens"])}
        if self.w_vectorizer is not None:
            tokens = entry["tokens"]
            if len(tokens) < self.max_text_len:
                tokens = ["sos/OTHER"] + tokens + ["eos/OTHER"]
                sent_len = len(tokens)
                tokens = tokens + ["unk/OTHER"] * (
                    self.max_text_len + 2 - sent_len
                )
            else:
                tokens = tokens[: self.max_text_len]
                tokens = ["sos/OTHER"] + tokens + ["eos/OTHER"]
                sent_len = len(tokens)
            embs, ohs = zip(*(self.w_vectorizer[t] for t in tokens))
            out["word_embeddings"] = np.stack(embs).astype(np.float32)
            out["pos_one_hots"] = np.stack(ohs).astype(np.float32)
            out["sent_len"] = sent_len
        return out


class TextOnlyDataset:
    """Caption-only dataset for generation without mocap
    (reference: dataset.py:641)."""

    def __init__(self, root: str, split: str = "test",
                 max_motion_length: int = 196):
        self.max_motion_length = max_motion_length
        self.mean = np.load(pjoin(root, "Mean.npy"))
        self.std = np.load(pjoin(root, "Std.npy"))
        text_dir = pjoin(root, "texts")
        with open(pjoin(root, f"{split}.txt")) as f:
            id_list = [line.strip() for line in f if line.strip()]
        self.captions = []
        for name in id_list:
            try:
                with open(pjoin(text_dir, name + ".txt")) as f:
                    for line in f:
                        cap = line.strip().split("#")[0]
                        if cap:
                            self.captions.append(cap)
                            break
            except FileNotFoundError:
                continue

    def inv_transform(self, data):
        return data * self.std + self.mean

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, item: int) -> dict:
        return {
            "motion": np.zeros((self.max_motion_length, len(self.mean)),
                               np.float32),
            "length": self.max_motion_length,
            "text": self.captions[item],
        }


def make_synthetic_humanml(
    root: str, n_clips: int = 8, dim: int = 263, seed: int = 0,
    splits=("train", "val", "test"),
) -> str:
    """Synthetic HumanML3D-layout dataset (smooth random features)."""
    rng = np.random.RandomState(seed)
    os.makedirs(pjoin(root, "new_joint_vecs"), exist_ok=True)
    os.makedirs(pjoin(root, "texts"), exist_ok=True)
    names = []
    for i in range(n_clips):
        name = f"{i:06d}"
        names.append(name)
        t = rng.randint(60, 196)
        motion = np.cumsum(rng.randn(t, dim).astype(np.float32) * 0.05, 0)
        np.save(pjoin(root, "new_joint_vecs", name + ".npy"), motion)
        with open(pjoin(root, "texts", name + ".txt"), "w") as f:
            f.write(
                "a person walks forward and waves#a/DET person/NOUN "
                "walk/VERB forward/ADV#0.0#0.0\n"
            )
    cat = np.concatenate(
        [np.load(pjoin(root, "new_joint_vecs", n + ".npy")) for n in names]
    )
    np.save(pjoin(root, "Mean.npy"), cat.mean(0))
    np.save(pjoin(root, "Std.npy"),
            np.where(cat.std(0) == 0, 1, cat.std(0)))
    k = max(1, n_clips // len(splits))
    for si, split in enumerate(splits):
        with open(pjoin(root, f"{split}.txt"), "w") as f:
            chunk = names[si * k : (si + 1) * k] or names[:1]
            f.write("\n".join(chunk) + "\n")
    return root
