"""Generate fixtures/ckpt_reduced_bert.npz — a frozen small-config BERT
checkpoint in the reference's exported state-dict layout, used by
tests/test_checkpoint.py to prove the BERT S4 load path
(bert_kernels.load_bert_state_dict_npz) end-to-end.

Arrays are written in the HF/torch on-disk conventions the real export
would produce (tools/export_ckpt.py over a softmax BERT model,
pretrain.py:149-176 loading semantics):
  - nn.Linear weights as (out_features, in_features) — the loader must
    transpose them into our x @ W layout; intermediate/output dense are
    asymmetric (512 x 128 vs 128 x 512), so a missed transpose fails
    shape validation rather than silently passing;
  - nn.Embedding weights as (rows, hidden), untransposed;
  - keys under sentence_encoder.bert.* / fc.* exactly as torch names
    nested modules (bert_encoder.py:20, softmax_nn.py:20).

Seed 5353 deliberately differs from the engine default (1234/4321) so a
passing golden proves the loader loaded rather than fell back.

Run from the repo root: python tools/make_bert_ckpt_fixture.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HIDDEN, LAYERS, HEADS, INTER, MAX_POS = 128, 4, 4, 512, 128
SEED = 5353


def main() -> None:
    from opennre_spark import relations
    from opennre_spark.functions.bert_tokenization import build_wordpiece_vocab

    vocab_size = len(build_wordpiece_vocab())
    rel2id = relations.rel2id_for("reduced")
    rng = np.random.default_rng(SEED)

    def a(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    pfx = "sentence_encoder.bert."
    out: dict[str, np.ndarray] = {
        pfx + "embeddings.word_embeddings.weight": a(vocab_size, HIDDEN),
        pfx + "embeddings.position_embeddings.weight": a(MAX_POS, HIDDEN),
        pfx + "embeddings.token_type_embeddings.weight": a(2, HIDDEN),
        pfx + "embeddings.LayerNorm.weight": 1.0
        + a(HIDDEN, scale=0.01),
        pfx + "embeddings.LayerNorm.bias": a(HIDDEN, scale=0.01),
        pfx + "pooler.dense.weight": a(HIDDEN, HIDDEN),
        pfx + "pooler.dense.bias": a(HIDDEN, scale=0.01),
        "fc.weight": a(len(rel2id), HIDDEN, scale=1.0 / np.sqrt(HIDDEN)),
        "fc.bias": a(len(rel2id), scale=0.01),
    }
    for i in range(LAYERS):
        lp = f"{pfx}encoder.layer.{i}."
        for name in ("query", "key", "value"):
            out[lp + f"attention.self.{name}.weight"] = a(HIDDEN, HIDDEN)
            out[lp + f"attention.self.{name}.bias"] = a(HIDDEN, scale=0.01)
        out[lp + "attention.output.dense.weight"] = a(HIDDEN, HIDDEN)
        out[lp + "attention.output.dense.bias"] = a(HIDDEN, scale=0.01)
        out[lp + "attention.output.LayerNorm.weight"] = 1.0 + a(HIDDEN, scale=0.01)
        out[lp + "attention.output.LayerNorm.bias"] = a(HIDDEN, scale=0.01)
        # asymmetric (out, in) shapes: transpose bugs fail loudly
        out[lp + "intermediate.dense.weight"] = a(INTER, HIDDEN)
        out[lp + "intermediate.dense.bias"] = a(INTER, scale=0.01)
        out[lp + "output.dense.weight"] = a(HIDDEN, INTER)
        out[lp + "output.dense.bias"] = a(HIDDEN, scale=0.01)
        out[lp + "output.LayerNorm.weight"] = 1.0 + a(HIDDEN, scale=0.01)
        out[lp + "output.LayerNorm.bias"] = a(HIDDEN, scale=0.01)
    # heads are not shape-derivable; hidden//64 = 2 would be wrong for
    # this small config, so the export records them explicitly
    out["__heads__"] = np.int64(HEADS)
    out["__rel2id__"] = np.str_(json.dumps(rel2id))

    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "ckpt_reduced_bert.npz",
    )
    np.savez(dst, **out)
    print(f"wrote {len(out)} arrays to {dst}")


if __name__ == "__main__":
    main()
