"""Count cgroup-capped 2->8 pairs at the current measurement revision,
split by the harness's own fairness rule (scaling_bench.pair_fair)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from scaling_bench import REV, collect_pairs  # noqa: E402

pairs = collect_pairs((2, 8, 16000), REV)
fair = sorted(p["eff"] for p in pairs if p["fair"])
unfair = sorted(p["eff"] for p in pairs if not p["fair"])
mid = fair[(len(fair) - 1) // 2] if fair else None
import statistics  # noqa: E402

med = round(statistics.median(fair), 4) if fair else None
print(f"rev={REV} fair={len(fair)} median={med} effs={fair}")
print(f"unfair={len(unfair)} effs={unfair}")
