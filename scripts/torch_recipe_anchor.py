"""Reference-semantics PyTorch anchor for the recipe parity record (r4 #5).

Runs the reference's supervised recipe loop (tools/train.py:271-341
semantics: per-epoch shuffle, MSE loss, SGD momentum 0.9, LR 1e-5, val
every val_epoch, best-val-MAE tracking) with the test-suite's TorchSiT —
the eager-PyTorch model the golden-parity suite pins to the reference
weight map (tests/torch_ref.py, anchored to HF ViT in
tests/test_torch_ref_anchor.py) — on the SAME synthetic dHCP-scale dataset
scripts/run_recipe_r05.py generates.

CPU fp32 eager (no A100 here); at ~5 train surf/s on this host's single
core a 100-epoch run is ~5 h, so the anchor horizon is configurable and
recorded. Writes /tmp/recipe_r05/torch_anchor.json.

Run: python scripts/torch_recipe_anchor.py [epochs]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np
import torch

WORK = Path("/tmp/recipe_r05")


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    val_epoch = 5
    d = WORK / "scan_age" / "template"
    data = np.load(d / "train_data.npy")
    labels = np.load(d / "train_labels.npy")
    vdata = np.load(d / "validation_data.npy")
    vlabels = np.load(d / "validation_labels.npy")

    from tests.torch_ref import TorchSiT

    torch.manual_seed(0)
    model = TorchSiT(dim=192, depth=12, heads=3, mlp_dim=768, dim_head=64,
                     num_patches=320, num_vertices=153)
    opt = torch.optim.SGD(model.parameters(), lr=1e-5, momentum=0.9)
    crit = torch.nn.MSELoss()
    bs = 256
    n = data.shape[0]
    g = torch.Generator().manual_seed(0)

    xv = torch.from_numpy(vdata)
    best, best_epoch = float("inf"), -1
    t0 = time.time()
    for epoch in range(epochs):
        te = time.time()
        model.train()
        order = torch.randperm(n, generator=g).numpy()
        for i in range(0, n, bs):
            idx = order[i:i + bs]
            xb = torch.from_numpy(data[idx])
            yb = torch.from_numpy(labels[idx])
            opt.zero_grad()
            out = model(xb)
            loss = crit(out.squeeze(), yb)
            loss.backward()
            opt.step()
        line = f"epoch {epoch}: train loss {float(loss):.5f} ({time.time()-te:.1f}s)"
        if (epoch + 1) % val_epoch == 0 or epoch == epochs - 1:
            model.eval()
            preds = []
            with torch.no_grad():
                for i in range(0, xv.shape[0], bs):
                    preds.append(model(xv[i:i + bs]).squeeze(-1))
            mae = float((torch.cat(preds) - torch.from_numpy(vlabels))
                        .abs().mean())
            line += f" val MAE {mae:.5f}"
            if mae < best:
                best, best_epoch = mae, epoch
        print(line, flush=True)

    out = {
        "driver": "tests/torch_ref.TorchSiT, reference tools/train.py:271-341 "
                  "loop semantics, CPU fp32 eager",
        "epochs": epochs,
        "val_epoch": val_epoch,
        "best_val_mae": best,
        "best_epoch": best_epoch,
        "wall_s": round(time.time() - t0, 1),
    }
    (WORK / "torch_anchor.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
