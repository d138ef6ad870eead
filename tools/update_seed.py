"""Merge builder-captured bench stage JSONL into bench_seed.json.

Usage: python tools/update_seed.py "<provenance note>" file1.jsonl [file2...]

Each input line is one stage's JSON dict as printed by
``python bench.py --stages ...`` (child mode). Keys are merged into the
seed's key map (later files win); the provenance note is appended so the
seed file stays auditable (bench.py's consolidated line separately lists
which stages re-ran live in the driver window).
"""

import json
import sys

SEED = "/root/repo/bench_seed.json"


def main():
    note, paths = sys.argv[1], sys.argv[2:]
    with open(SEED) as f:
        seed = json.load(f)
    n = 0
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                rec = json.loads(line)
                rec.pop("_stage", None)
                rec.pop("platform", None)  # live runs set their own
                seed["keys"].update(rec)
                n += len(rec)
    prov = seed.get("_provenance", "")
    seed["_provenance"] = f"{prov} | {note}"
    with open(SEED, "w") as f:
        json.dump(seed, f, indent=1, sort_keys=True)
    print(f"merged {n} keys from {len(paths)} files; "
          f"seed now has {len(seed['keys'])} keys")


if __name__ == "__main__":
    main()
