"""Face2Text data loader — reference-API-compatible, TPU-fed.

API parity with `AlexCap/MyDataLoader.py`: split codes 0/1/2, a
per-split iterator with wrap-to-zero semantics (`:71-83`), multinomial
random sampling when not iterating, `getSeqLength`/`getVocabSize`/
`reset_iterator`, and the returned `(img, labels, info, attributes)`
tuple with clamped attributes (`:88-95`).

TPU-native differences:
- batches leave the host as **uint8 HWC**; resize/normalize run
  on-device inside the jitted step (`data.transforms`) instead of
  torchvision host transforms;
- `prefetch_batches` overlaps host HDF5 reads and H2D copies with
  device compute via a background thread + `jax.device_put`;
- the whole split can be cached in RAM (`cache_images=True`, default —
  the reference's h5 fancy-read per batch is its top host bottleneck).
"""

from __future__ import annotations

import json
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from imagecaptioning_tpu.data.tokenizer import Vocab


class AlexDataLoader:
    """Loads the Face2Text HDF5 + dicts JSON produced by
    `data.preprocess_face2text` (or the reference preprocessor)."""

    def __init__(self, opt=None, *, data_h5: Optional[str] = None,
                 data_json: Optional[str] = None,
                 arrays: Optional[Dict] = None, info: Optional[Dict] = None,
                 cache_images: bool = True, seed: int = 123):
        if opt is not None:
            data_h5 = data_h5 or opt.get("data_h5")
            data_json = data_json or opt.get("data_json")
        if arrays is None:
            import h5py
            with open(data_json, "r") as f:
                info = json.load(f)
            f5 = h5py.File(data_h5, "r")
            keys = ["img_to_first_phr", "img_to_last_phr", "labels",
                    "lengths", "split", "attributes"]
            arrays = {k: f5["/" + k][:] for k in keys}
            if cache_images:
                arrays["images"] = f5["/images"][:]
                f5.close()
            else:
                arrays["images"] = f5["/images"]  # lazy h5 dataset
        assert info is not None

        self.info = info
        self.vocab = Vocab.from_dicts_json(info)
        self.vocab_size = self.vocab.vocab_size
        self.idx_to_token = self.vocab.idx_to_token
        self.attributes_labels = info.get("attributes_labels", [])

        self.images = arrays["images"]
        self.labels = np.asarray(arrays["labels"])
        self.lengths = np.asarray(arrays["lengths"])
        self.split = np.asarray(arrays["split"])
        self.attributes = np.asarray(arrays["attributes"])
        self.img_to_first_phr = np.asarray(arrays["img_to_first_phr"])
        self.img_to_last_phr = np.asarray(arrays["img_to_last_phr"])

        self.num_images = self.images.shape[0]
        self.seq_length = int(self.labels.shape[1])
        self.iterators = {0: 0, 1: 0, 2: 0}
        self._rng = np.random.RandomState(seed)

        self.split_ix: Dict[int, List[int]] = {0: [], 1: [], 2: []}
        for i in range(self.num_images):
            self.split_ix[int(self.split[i])].append(i)

    # --- reference API -------------------------------------------------
    def getSeqLength(self) -> int:
        return self.seq_length

    def getVocabSize(self) -> int:
        return self.vocab_size

    def reset_iterator(self, split_val: int) -> None:
        self.iterators[split_val] = 0

    def get_batch(self, opt, batch_size: int, idx: int = -1):
        """Returns (images_u8 (B,H,W,3), labels (B,T) i32, info_table,
        attributes (B,40) clamped ≥0). One caption per image: the first
        phrase of the image's slab, like the reference preprocessor's
        labels layout."""
        split_val = opt.get("split", 0) if hasattr(opt, "get") else 0
        iterate = opt.get("iterate", True) if hasattr(opt, "get") else True
        split_ix = self.split_ix[split_val]
        assert len(split_ix) > 0, "split is empty?"
        max_index = len(split_ix)

        if iterate:
            ri = self.iterators[split_val]
            ri_next = ri + batch_size
            if ri_next >= max_index:
                ri_next = 0      # wrap like the reference (drops tail batch)
            self.iterators[split_val] = ri_next
            ix = split_ix[ri:ri + batch_size]
        elif idx != -1:
            ix = [split_ix[idx]]
            ri = idx
        else:
            ri = np.sort(self._rng.choice(max_index, size=batch_size,
                                          replace=False))
            ix = [split_ix[r] for r in ri]

        ix = np.asarray(ix)
        images = np.stack([np.asarray(self.images[int(i)]) for i in ix]) \
            if not isinstance(self.images, np.ndarray) else self.images[ix]
        label_idx = self.img_to_first_phr[ix]
        labels = self.labels[label_idx]
        attrs = np.clip(self.attributes[ix], 0, None)
        filenames = [self.info["idx_to_filename"][str(int(i))]
                     for i in ix] if "idx_to_filename" in self.info else []
        info_table = [{"filename": filenames, "split_bounds": [ri, max_index]}]
        return images, labels, info_table, attrs

    # --- TPU feeding ----------------------------------------------------
    def epoch_position_batches(self, split_val: int, batch_size: int,
                               shuffle: bool = False,
                               start: int = 0) -> Iterator[np.ndarray]:
        """Yield sorted SPLIT-LOCAL position batches (indices into the
        split's own 0..n-1 range) covering the split once, ragged tail
        dropped. This is the single source of batch order: the streaming
        path maps positions to global ids and gathers on the host; the
        device-resident path ships the positions (512 B/batch) and
        gathers in HBM — both see identical batches by construction."""
        n = len(self.split_ix[split_val])
        pos = np.arange(n)
        if shuffle:
            pos = self._rng.permutation(pos)
        if start:
            pos = pos[start % n:]
        for s in range(0, len(pos) - batch_size + 1, batch_size):
            yield np.sort(pos[s:s + batch_size])

    def epoch_batches(self, split_val: int, batch_size: int,
                      shuffle: bool = False,
                      start: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (images_u8, labels) covering a split once, dropping the
        ragged tail (static shapes for jit). `start` skips that many
        leading images — the sequential-mode resume cursor."""
        ix_arr = np.asarray(self.split_ix[split_val])
        for p in self.epoch_position_batches(split_val, batch_size,
                                             shuffle=shuffle, start=start):
            sel = ix_arr[p]      # sorted: ix_arr ascending, p sorted
            if isinstance(self.images, np.ndarray):
                # native multi-threaded gather (C++ fastloader) when built
                from imagecaptioning_tpu.native import gather_records
                images = gather_records(self.images, sel)
            else:
                images = np.stack([np.asarray(self.images[int(i)])
                                   for i in sel])
            yield images, self.labels[self.img_to_first_phr[sel]]

    def resident_arrays(self, split_val: int) -> Tuple[np.ndarray, np.ndarray]:
        """(images_u8 (n,H,W,3), labels (n,T)) for a whole split in
        split-local position order — the host-side source for staging
        the split in device HBM (`data.device_store`). One contiguous
        copy; positions from `epoch_position_batches` index it directly."""
        ix_arr = np.asarray(self.split_ix[split_val])
        if isinstance(self.images, np.ndarray):
            from imagecaptioning_tpu.native import gather_records
            images = gather_records(self.images, ix_arr)
        else:
            images = np.stack([np.asarray(self.images[int(i)])
                               for i in ix_arr])
        return images, self.labels[self.img_to_first_phr[ix_arr]]


def prefetch_batches(it: Iterator, size: int = 2,
                     device_put=None) -> Iterator:
    """Run `it` in a background thread, optionally `jax.device_put`-ing
    each element, keeping `size` batches in flight so the host pipeline
    overlaps device compute."""
    import jax

    if device_put is None:
        device_put = jax.device_put
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(jax.tree.map(device_put, item))
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
