"""Snapshot the live PlaNet north-star session's evidence into results/.

Copies the CSV logs + config from the (git-ignored) exp work dir into
``results/planet/northstar_r3/`` and renders the learning curve, so the run's
state is committable at any point mid-session (VERDICT r2 #10: evidence of
long runs must live in the repo, success or failure).
"""
import os
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent
# override with PLANET_WORK_DIR / PLANET_SNAPSHOT_NAME for later rounds
_RUN = os.environ.get("PLANET_WORK_DIR", "planet_r3_northstar")
_SNAP = os.environ.get("PLANET_SNAPSHOT_NAME", "northstar_r3")
SRC = REPO / "exp" / _RUN
DST = REPO / "results" / "planet" / _SNAP


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    for name in ("results.csv", "metrics.csv", "model_train.csv", "config.yaml"):
        if (SRC / name).exists():
            shutil.copy2(SRC / name, DST / name)

    # learning curve: train episodes + test (noise-free) episodes
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    rows = np.genfromtxt(DST / "results.csv", delimiter=",", names=True)
    if rows.size == 0:
        print("no episodes yet")
        return
    rows = np.atleast_1d(rows)
    steps = rows["env_step"]
    train_r = rows["train_episode_reward"]
    test_r = rows["episode_reward"]
    fig, ax = plt.subplots(figsize=(7, 4))
    m = train_r > 0
    ax.plot(steps[m], train_r[m], "o-", ms=3, lw=1, label="train episode (noise 0.3)")
    m = test_r > 0
    if m.any():
        ax.plot(steps[m], test_r[m], "s", ms=5, color="crimson", label="test episode")
    ax.axhspan(200, 400, alpha=0.12, color="gray", label="random-policy band")
    ax.set_xlabel("env steps")
    ax.set_ylabel("episode reward")
    ax.set_title("PlaNet dm_control cartpole-balance (TPU v5e, round 3)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(DST / "planet_curve.png", dpi=120)
    n = len(rows)
    print(f"snapshot: {n} episodes, last step {int(steps[-1])}, "
          f"last train reward {train_r[-1]:.1f}")


if __name__ == "__main__":
    main()
