"""Released architecture genotypes arch0/arch1/arch2.

Reference: the examples notebook hard-codes the three released genotypes
(SURVEY.md §2#13); they are required inputs for checkpoint-level parity
(SURVEY.md §7.4 item 2). The reference mount was EMPTY when this module
was written (SURVEY.md §0), so the literals below are **provisional
stand-ins**: schema-valid genotypes of the right shape (3-node contextual
cell, 3 merge blocks over 4 encoder taps) used to exercise every code
path and to benchmark. The moment the reference notebook is available,
replace these with the released literals — nothing else changes, the
builder is genotype-agnostic.

Each entry: genotype = [cell_config, conns] (see micro_decoders docstring).
"""

# PROVISIONAL — replace with released literals when /root/reference is live.
ARCHS = {
    # mixes sep-convs, a dilated conv, GAP branch — exercises most ops
    "arch0": [
        [2, [0, 1, 3, 4], [2, 0, 5, 2], [1, 3, 8, 0]],
        [[3, 2], [4, 1], [5, 0]],
    ],
    # lighter: more skips and 1x1s
    "arch1": [
        [0, [1, 0, 9, 2], [0, 2, 2, 4], [3, 1, 0, 9]],
        [[3, 2], [2, 4], [1, 0]],
    ],
    # smallest: dominated by skip/sep3x3
    "arch2": [
        [9, [0, 1, 2, 9], [1, 2, 9, 0], [0, 3, 9, 2]],
        [[2, 3], [4, 1], [5, 0]],
    ],
}

# PROVISIONAL — the WACV'20 template family's released sub-megabyte
# models (SURVEY.md §2#3b). Same caveat as ARCHS: schema-valid
# stand-ins exercising the template ops (AGG cells over tap pairs)
# until the reference notebook's literals are available. Entry:
# [[conn, conn, op, op], ...] per merge block (template_decoders).
TEMPLATE_ARCHS = {
    "template0": [[3, 2, 0, 2], [4, 1, 1, 4], [5, 0, 0, 9]],
}
