"""Model/pipeline hyperparameters.

Values mirror the reference wiki80_cnn_softmax configuration
(/root/reference/opennre/pretrain.py:136-146): max_length=40,
word emb 50-d, position emb 5-d, hidden 230, kernel 3, padding 1.
"""

MAX_LENGTH = 40
WORD_SIZE = 50
POSITION_SIZE = 5
HIDDEN_SIZE = 230
KERNEL_SIZE = 3
PADDING_SIZE = 1

# Eval-time encoder micro-batch, bounds memory inside a UDF batch
# (reference: opennre/model/bag_attention.py:140 `bs = 256`).
EVAL_MICRO_BATCH = 256

# Candidate-pair generation: max turn distance within a conversation.
PAIR_WINDOW_TURNS = 2

# Negative-label name lists, kept verbatim per the reference:
# bag/sentence eval (data_loader.py:67-74) and the multi-label
# variant (data_loader.py:390-391).
NEG_LABEL_NAMES = ["NA", "na", "no_relation", "Other", "Others"]
MULTILABEL_NA_NAMES = ["NA", "na", "N/A", "None", "none", "n/a", "no_relation"]

# Default decision threshold (data_loader.py:239 `threshold=0.5`).
SCORE_THRESHOLD = 0.5

# Arrow batch sizing for mapInPandas/applyInPandas kernels.
ARROW_MAX_RECORDS = 2048

# BERT-path sequence length (reference examples use 80-128 with
# bert-base; the seeded small-config encoder keeps 64 for sane compute).
BERT_MAX_LENGTH = 64
