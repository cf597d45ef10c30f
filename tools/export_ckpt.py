"""Export a reference OpenNRE torch checkpoint to the .npz state-dict
rendition consumed by opennre_spark.functions.weights.load_state_dict_npz
(S4 checkpoint source).

Run on a machine that HAS torch (this sandbox does not):

    python tools/export_ckpt.py wiki80_cnn_softmax.pth.tar out.npz \
        [benchmark/wiki80/wiki80_rel2id.json]

The reference saves checkpoints as {'state_dict': OrderedDict[str,
Tensor]} (sentence_re.py:133-139, bag_re.py:148-151) and loads them with
torch.load(ckpt)['state_dict'] (pretrain.py:147,161,175); this script
materializes each tensor as a float32 numpy array under its state-dict
key.

Pass the benchmark's rel2id.json (the file the reference downloads next
to the checkpoint, pretrain.py:69-99) as the optional third argument: it
is embedded as `__rel2id__` so the loader can align classifier rows to
the engine's relation-id order — the downloaded rel2id orderings are
arbitrary, and matching only the relation count would silently permute
every prediction's label (ADVICE r2). Exports without it still load, but
the engine then trusts its reconstructed fixture ordering.

fixtures/ckpt_reduced_cnn.npz in this repo is a tiny seed-generated
stand-in with the same key layout, used by tests/test_checkpoint.py to
prove the load path end-to-end.
"""

from __future__ import annotations

import json
import sys


# mirror of opennre_spark.functions.bert_kernels._HF_STANDARD_HEADS —
# duplicated deliberately so this script stays standalone on the
# torch-equipped export machine (no repo import needed there); a parity
# test in tests/test_checkpoint.py keeps the two tables identical
HF_STANDARD_HEADS = {128: 2, 256: 4, 512: 8, 768: 12, 1024: 16}


def main() -> None:
    heads = None
    argv = list(sys.argv)
    if "--heads" in argv:
        i = argv.index("--heads")
        try:
            heads = int(argv[i + 1])
        except (IndexError, ValueError):
            sys.exit("--heads requires an integer head count, e.g. --heads 12")
        del argv[i : i + 2]
    sys.argv = argv
    if len(sys.argv) not in (3, 4):
        sys.exit(
            "usage: export_ckpt.py <ckpt.pth.tar> <out.npz> "
            "[rel2id.json] [--heads N]"
        )
    try:
        import torch
    except ImportError:
        sys.exit(
            "torch is not installed in this environment; run the export "
            "on a torch-equipped machine (the .npz it produces is "
            "consumed here without torch)"
        )
    import numpy as np

    state = torch.load(sys.argv[1], map_location="cpu")["state_dict"]
    arrays = {
        k: v.detach().cpu().numpy().astype(np.float32) for k, v in state.items()
    }
    if len(sys.argv) == 4:
        with open(sys.argv[3]) as f:
            arrays["__rel2id__"] = np.str_(json.dumps(json.load(f)))
    # BERT exports must carry the attention head count: it is not
    # recoverable from tensor shapes, and the loader refuses to guess
    # for nonstandard hidden sizes (bert_kernels._HF_STANDARD_HEADS).
    emb_key = "sentence_encoder.bert.embeddings.word_embeddings.weight"
    if emb_key in arrays:
        hidden = int(arrays[emb_key].shape[1])
        if heads is None:
            heads = HF_STANDARD_HEADS.get(hidden)
        if heads is None:
            sys.exit(
                f"hidden size {hidden} is not a standard HF config; "
                "pass --heads N so the export records the head count"
            )
        arrays["__heads__"] = np.int64(heads)
    np.savez(sys.argv[2], **arrays)
    print(f"wrote {len(arrays)} arrays to {sys.argv[2]}")


if __name__ == "__main__":
    main()
