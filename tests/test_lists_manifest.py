"""The vendored static eval/mixture lists are pinned by a sha256 manifest.

The released eval protocol (reference ``README.md:84-89``, ``test.py``) reads
plain-text mixture/dialog lists from ``data/{DailyTalk,SpokenWoz,TEDLIUM}``.
We vendor those lists (they are metadata: relative wav paths + SNRs) so
``test.py --test_dataset dailytalk`` runs out of the box, and pin every file
in ``data/LISTS_MANIFEST.sha256`` so any drift from the released protocol is
caught here.
"""

import hashlib
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "data")
MANIFEST = os.path.join(DATA, "LISTS_MANIFEST.sha256")

# every list the eval/train protocol reads must be pinned
REQUIRED = [
    "DailyTalk/test_dialog.txt",
    "DailyTalk/test_mix.txt",
    "DailyTalk/train_dialog.txt",
    "DailyTalk/val_dialog.txt",
    "DailyTalk/val_mix.txt",
    "SpokenWoz/Error_dialog.txt",
    "SpokenWoz/test_mix.txt",
    "SpokenWoz/val_mix.txt",
    "TEDLIUM/dev.orig/segments",
    "TEDLIUM/dev.orig/text",
    "TEDLIUM/test.orig/segments",
    "TEDLIUM/test.orig/text",
    "TEDLIUM/test_mix.txt",
    "TEDLIUM/test_mix_3speaker.txt",
    "TEDLIUM/val_mix.txt",
    "TEDLIUM/val_mix_3speaker.txt",
]


def _manifest() -> dict[str, str]:
    entries = {}
    with open(MANIFEST) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            digest, _, rel = line.partition("  ")
            entries[rel] = digest
    return entries


def test_manifest_covers_required_lists():
    entries = _manifest()
    missing = [rel for rel in REQUIRED if rel not in entries]
    assert not missing, f"lists not pinned in LISTS_MANIFEST.sha256: {missing}"


def test_vendored_lists_match_manifest():
    for rel, want in _manifest().items():
        path = os.path.join(DATA, rel)
        assert os.path.exists(path), f"pinned list missing on disk: {rel}"
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        assert h.hexdigest() == want, f"vendored list drifted: {rel}"
