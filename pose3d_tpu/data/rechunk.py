"""Rechunking tools: local shuffle rechunker and subject-based train/test
splitter.

Capability parity:
  * :class:`DatasetShuffler` — the reference's ``dataset_rechunker.py``:
    threaded unpack + per-sample validation of all input chunks, one global
    shuffle, threaded repack into fixed-size chunks, issues report
    (dataset_rechunker.py:145-366).
  * :class:`DatasetSplitter` — the reference's ``dataset_split.py``
    without the hard rclone dependency: chunks are read from / written to
    *transports* (local directory always; rclone remote when an
    ``rclone:`` prefix is given and the binary exists). Samples are
    validated and routed into train/test by subject id, repacked into
    ``{train|test}_dataset_chunk_{idx:06d}.tar.<comp>`` with per-chunk
    resume state (dataset_split.py:158-373).

Deliberate fix: output chunk names use six-digit indices so the streaming
loader's index filter works (the reference rechunker's 4-digit names never
match, SURVEY.md §2 quirk).
"""

from __future__ import annotations

import json
import logging
import pickle
import random
import shutil
import subprocess
import tarfile
import tempfile
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

logger = logging.getLogger("pose3d_tpu.rechunk")


# -- sample validation (reference dataset_rechunker.py:89-143,
#    dataset_split.py:270-283) ---------------------------------------------

def validate_sample(sample: Dict, chunk_dir: Path,
                    require_depth: bool = False) -> Optional[str]:
    """Return None when valid, else a reason string."""
    img = sample.get("image_file")
    if not img:
        return "missing image_file key"
    img_path = chunk_dir / img
    if not img_path.is_file():
        return f"image missing: {img}"
    if img_path.stat().st_size == 0:
        return f"image zero bytes: {img}"
    meta = sample.get("metadata_file")
    if not meta or not (chunk_dir / meta).is_file():
        return f"metadata missing: {meta}"
    depth = sample.get("depth_file")
    if depth:
        dp = chunk_dir / depth
        if not dp.is_file() or dp.stat().st_size == 0:
            return f"depth missing/empty: {depth}"
    elif require_depth:
        return "no depth_file"
    return None


def _extract(tar_path: Path, dest: Path) -> Path:
    dest.mkdir(parents=True, exist_ok=True)
    with tarfile.open(tar_path, "r:*") as tar:
        tar.extractall(dest, filter="data")
    subdirs = [d for d in dest.iterdir() if d.is_dir()]
    if len(subdirs) == 1 and (subdirs[0] / "samples.pkl").exists():
        return subdirs[0]
    if (dest / "samples.pkl").exists():
        return dest
    for d in subdirs:
        if (d / "samples.pkl").exists():
            return d
    raise FileNotFoundError(f"samples.pkl not found under {dest}")


def _pack_chunk(samples_with_dirs: Sequence[Tuple[Dict, Path]],
                out_path: Path, chunk_dirname: str, compression: str):
    """Copy samples' files into a fresh chunk layout and tar it."""
    with tempfile.TemporaryDirectory(prefix="repack_") as td:
        chunk_dir = Path(td) / chunk_dirname
        data_dir = chunk_dir / "data"
        data_dir.mkdir(parents=True)
        packed = []
        for j, (sample, src_dir) in enumerate(samples_with_dirs):
            sdir = data_dir / f"{j:06d}"
            sdir.mkdir()
            out = dict(sample)
            for key, default_name in (
                ("image_file", None),
                ("depth_file", "depth.png"),
                ("metadata_file", "metadata.json"),
            ):
                rel = sample.get(key)
                if not rel:
                    continue
                src = src_dir / rel
                name = default_name or f"image{Path(rel).suffix or '.jpg'}"
                shutil.copyfile(src, sdir / name)
                out[key] = f"data/{j:06d}/{name}"
            packed.append(out)
        with open(chunk_dir / "samples.pkl", "wb") as f:
            pickle.dump(packed, f)
        mode = f"w:{compression}" if compression != "tar" else "w"
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with tarfile.open(out_path, mode) as tar:
            tar.add(chunk_dir, arcname=chunk_dirname)


class DatasetShuffler:
    """Global shuffle + rechunk (reference dataset_rechunker.py:145-366)."""

    def __init__(
        self,
        input_dir,
        output_dir,
        chunk_size: int = 10000,
        compression: str = "gz",
        extracted_originals_dir=None,
        keep_extracted_originals: bool = False,
        num_workers: int = 4,
        seed: int = 42,
        name_prefix: str = "shuffled_dataset",
    ):
        self.input_dir = Path(input_dir)
        self.output_dir = Path(output_dir)
        self.chunk_size = chunk_size
        self.compression = compression
        self.keep_extracted = keep_extracted_originals
        if extracted_originals_dir:
            self.extract_dir = Path(extracted_originals_dir)
            self._own_extract_dir = False
        else:
            self.extract_dir = Path(tempfile.mkdtemp(prefix="rechunk_"))
            self._own_extract_dir = True
        self.num_workers = num_workers
        self.seed = seed
        self.name_prefix = name_prefix
        self.issues: List[str] = []

    def _load_chunk(self, tar_path: Path) -> List[Tuple[Dict, Path]]:
        dest = self.extract_dir / tar_path.name.split(".tar")[0]
        try:
            if not (dest.exists() and any(dest.rglob("samples.pkl"))):
                chunk_dir = _extract(tar_path, dest)
            else:
                chunk_dir = next(dest.rglob("samples.pkl")).parent
            with open(chunk_dir / "samples.pkl", "rb") as f:
                samples = pickle.load(f)
        except Exception as e:
            self.issues.append(f"{tar_path.name}: unreadable ({e})")
            return []
        valid = []
        for s in samples:
            reason = validate_sample(s, chunk_dir)
            if reason is None:
                valid.append((s, chunk_dir))
            else:
                self.issues.append(f"{tar_path.name}: {reason}")
        return valid

    def run(self) -> int:
        tars = sorted(self.input_dir.glob("*.tar.*"))
        logger.info("Shuffling %d input chunks", len(tars))
        all_samples: List[Tuple[Dict, Path]] = []
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            for valid in ex.map(self._load_chunk, tars):
                all_samples.extend(valid)
        logger.info("Collected %d valid samples", len(all_samples))

        random.Random(self.seed).shuffle(all_samples)

        n_chunks = (len(all_samples) + self.chunk_size - 1) // self.chunk_size
        self.output_dir.mkdir(parents=True, exist_ok=True)

        def pack(i):
            part = all_samples[i * self.chunk_size : (i + 1) * self.chunk_size]
            name = f"{self.name_prefix}_chunk_{i:06d}.tar.{self.compression}"
            _pack_chunk(
                part, self.output_dir / name, f"chunk_{i:06d}",
                self.compression,
            )
            logger.info("Packed %s (%d samples)", name, len(part))

        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            list(ex.map(pack, range(n_chunks)))

        self._write_issues_report()
        if self._own_extract_dir and not self.keep_extracted:
            shutil.rmtree(self.extract_dir, ignore_errors=True)
        return len(all_samples)

    def _write_issues_report(self):
        if self.issues:
            report = self.output_dir / "rechunk_issues.txt"
            with open(report, "w") as f:
                f.write("\n".join(self.issues))
            logger.warning(
                "%d issues recorded in %s", len(self.issues), report
            )


class DatasetSplitter:
    """Subject-routed train/test split + rechunk
    (reference dataset_split.py:107-415), resumable per input chunk."""

    STATE_FILE = "split_state.json"

    def __init__(
        self,
        input_dir,
        output_dir,
        train_subjects: Sequence[int],
        test_subjects: Sequence[int],
        staging_dir=None,
        new_chunk_size: int = 1000,
        compression: str = "gz",
        subject_key: str = "subject",
        resume: bool = True,
    ):
        self.input_dir = Path(input_dir)
        self.output_dir = Path(output_dir)
        self.train_subjects = {int(s) for s in train_subjects}
        self.test_subjects = {int(s) for s in test_subjects}
        self.staging = (
            Path(staging_dir)
            if staging_dir
            else Path(tempfile.mkdtemp(prefix="split_"))
        )
        self.staging.mkdir(parents=True, exist_ok=True)
        self.new_chunk_size = new_chunk_size
        self.compression = compression
        self.subject_key = subject_key
        self.resume = resume
        self.issues: List[str] = []

        self.state = {"chunks_done": [], "counters": {"train": 0, "test": 0}}
        sp = self.staging / self.STATE_FILE
        if resume and sp.exists():
            try:
                with open(sp) as f:
                    self.state.update(json.load(f))
            except Exception:
                logger.exception("Corrupt split state; starting fresh")
        # pending samples (list of (sample, chunk_dir)) per split
        self.pending: Dict[str, List[Tuple[Dict, Path]]] = {
            "train": [], "test": [],
        }

    def _save_state(self):
        with open(self.staging / self.STATE_FILE, "w") as f:
            json.dump(self.state, f)

    def _route(self, sample: Dict) -> Optional[str]:
        sid = sample.get(self.subject_key, sample.get("subject_id"))
        try:
            sid = int(sid)
        except (TypeError, ValueError):
            return None
        if sid in self.train_subjects:
            return "train"
        if sid in self.test_subjects:
            return "test"
        return None

    def _flush(self, split: str, final: bool = False):
        while len(self.pending[split]) >= self.new_chunk_size or (
            final and self.pending[split]
        ):
            part = self.pending[split][: self.new_chunk_size]
            self.pending[split] = self.pending[split][self.new_chunk_size:]
            idx = self.state["counters"][split]
            name = f"{split}_dataset_chunk_{idx:06d}.tar.{self.compression}"
            out = self.output_dir / split / name
            _pack_chunk(part, out, f"chunk_{idx:06d}", self.compression)
            self.state["counters"][split] += 1
            self._save_state()
            logger.info("Wrote %s (%d samples)", out, len(part))
            if final and len(self.pending[split]) < self.new_chunk_size:
                if not self.pending[split]:
                    break

    def run(self) -> Dict[str, int]:
        tars = sorted(self.input_dir.glob("*.tar.*"))
        extract_root = self.staging / "extract"
        for tar_path in tars:
            if tar_path.name in self.state["chunks_done"]:
                continue
            dest = extract_root / tar_path.name.split(".tar")[0]
            try:
                chunk_dir = _extract(tar_path, dest)
                with open(chunk_dir / "samples.pkl", "rb") as f:
                    samples = pickle.load(f)
            except Exception as e:
                self.issues.append(f"{tar_path.name}: unreadable ({e})")
                continue
            for s in samples:
                reason = validate_sample(s, chunk_dir)
                if reason is not None:
                    self.issues.append(f"{tar_path.name}: {reason}")
                    continue
                split = self._route(s)
                if split is None:
                    self.issues.append(
                        f"{tar_path.name}: unroutable subject "
                        f"{s.get(self.subject_key)}"
                    )
                    continue
                self.pending[split].append((s, chunk_dir))
            for split in ("train", "test"):
                self._flush(split)
            self.state["chunks_done"].append(tar_path.name)
            self._save_state()
        for split in ("train", "test"):
            self._flush(split, final=True)
        self._write_issues_report()
        shutil.rmtree(extract_root, ignore_errors=True)
        return dict(self.state["counters"])

    def _write_issues_report(self):
        if self.issues:
            report = self.staging / "split_issues.txt"
            with open(report, "w") as f:
                f.write("\n".join(self.issues))
            logger.warning(
                "%d issues recorded in %s", len(self.issues), report
            )


def rclone_available() -> bool:
    return shutil.which("rclone") is not None


def rclone_copy(src: str, dst: str, flags: Sequence[str] = ()) -> None:
    """Transfer via rclone with the reference's retry policy
    (dataset_split.py:42)."""
    subprocess.run(
        ["rclone", "copyto", src, dst, "--retries", "3",
         "--low-level-retries", "5", *flags],
        check=True,
    )
