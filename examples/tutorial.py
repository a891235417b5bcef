"""Worked end-to-end example (the reference ``tutorial.ipynb`` as a script).

Runs entirely on synthetic data (CPU-friendly, a few minutes):
  1. train the flagship contrastive model on two synthetic sections,
  2. dump both towers' embeddings,
  3. predict the held-out section's expression by top-K retrieval,
  4. rank genes by prediction quality and plot the best gene's spatial map,
  5. cluster predicted expression into domains.

Swap `synthetic.make_dataset` for `load_her2st(...)` (plus the shipped
785-gene panel) to reproduce the real HER2ST protocol.

Run:  python examples/tutorial.py [out_dir]
"""

import os
import sys

import numpy as np


def main(out_dir: str = "tutorial_out", max_epochs: int = 20) -> None:
    import jax

    from mclstexp_tpu.config import (
        Config, DataConfig, EvalConfig, ModelConfig, TrainConfig,
    )
    from mclstexp_tpu.data import synthetic
    from mclstexp_tpu.data.pipeline import ConcatSections, split_fold
    from mclstexp_tpu.infer import analysis, embed, evaluate
    from mclstexp_tpu.train.loop import train_fold
    from mclstexp_tpu.train.state import create_train_state
    from mclstexp_tpu.utils.logging import MetricLogger

    os.makedirs(out_dir, exist_ok=True)
    fold = 0

    cfg = Config(
        model=ModelConfig(
            encoder_name="tiny_cnn", image_dim=128, spot_dim=32,
            projection_dim=32, heads_num=4, heads_dim=8, head_layers=2,
        ),
        train=TrainConfig(
            batch_size=32, max_epochs=max_epochs, lr=3e-3, weight_decay=1e-3,
            checkpoint_dir=os.path.join(out_dir, "model_result"), log_every=0,
        ),
        eval=EvalConfig(batch_size=16, top_k=16, weight_ord=1),
        data=DataConfig(dataset="synthetic", num_folds=3),
    )
    sections = synthetic.make_dataset(
        num_sections=3, num_spots=64, num_genes=32, patch_size=24, seed=11
    )
    gene_names = [f"GENE{i}" for i in range(32)]

    print("== 1. training fold 0 ==")
    state = train_fold(cfg, sections, fold, logger=MetricLogger())

    print("== 2. embedding dump ==")
    train_secs, test_sec = split_fold(sections, fold)
    data = ConcatSections.from_sections(train_secs)
    b = data.take(np.arange(1))
    sample = {
        "image": b["image_u8"].astype(np.float32) / 255.0,
        "expression": b["expression"],
        "position": b["position"],
    }
    model, _ = create_train_state(cfg.model, cfg.train, sample)
    img, spot = embed.compute_embeddings(
        model, state.params, state.batch_stats, sections, cfg.eval.batch_size
    )
    sizes = [s.num_spots for s in sections]
    img_secs = embed.split_by_section(img, sizes)
    spot_secs = embed.split_by_section(spot, sizes)

    print("== 3. retrieval prediction for the held-out section ==")
    pred_path = os.path.join(out_dir, "pred.npy")
    metrics = evaluate.evaluate_fold(
        fold, img_secs[fold], spot_secs,
        [s.expression for s in sections],
        top_k=cfg.eval.top_k, weight_ord=cfg.eval.weight_ord,
        prediction_path=pred_path,
    )
    print("fold metrics:", {k: round(v, 4) for k, v in metrics.items()})
    pred = np.load(pred_path).T  # stored genes x spots

    print("== 4. gene ranking + spatial plot ==")
    ranking = analysis.gene_ranking(
        [pred], [sections[fold].expression], gene_names, [sections[fold].name]
    )
    print(ranking.head(5).to_string())
    best_gene = ranking.iloc[0]["gene"]
    analysis.compare_gene_plot(
        sections[fold].centers, pred, sections[fold].expression, gene_names,
        best_gene, os.path.join(out_dir, f"{best_gene}.png"),
    )
    print(f"wrote {out_dir}/{best_gene}.png")

    print("== 5. domain clustering ==")
    # synthetic sections carry no pathologist labels; cluster against a
    # 2-way split of the latent structure as a stand-in demonstration
    fake_labels = np.where(
        sections[fold].expression[:, 0] > np.median(sections[fold].expression[:, 0]),
        "high", "low",
    )
    print(analysis.domain_clustering(pred, fake_labels))


if __name__ == "__main__":
    main(*sys.argv[1:2])
