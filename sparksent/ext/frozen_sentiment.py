"""Frozen sentiment model — committed fixture, not a build artifact.

Token-keyed LogisticRegression weights in integer micro-units
(round(coef * 1e6)), trained ONCE by tools/freeze_sentiment_model.py
on /root/testdata/sf0.01 documents against the deterministic lexicon labels
(maxIter=30, regParam=0, CountVectorizer features over the
lowercased whitespace tokens).  Frozen because live-trained
coefficients are not bit-stable across partition layouts (LBFGS
treeAggregate summation order); see the tool docstring for the
measurement."""

INTERCEPT_E6 = -1330080

WEIGHTS_E6 = {
    'a': -471638,
    'agg': -4847666,
    'batch': 17037301,
    'big': 21469729,
    'column': 339036,
    'customer': -278716,
    'data': 2647174,
    'dup': -85923006,
    'fast': 36236209,
    'filter': -20251672,
    'group': 18241563,
    'hash': -19423108,
    'join': 21622925,
    'key': 553567,
    'line': 4737080,
    'merge': 21527799,
    'order': 84202,
    'part': -18194495,
    'query': 15577706,
    'row': -1396265,
    'scan': -57996807,
    'slow': -80258751,
    'small': -39120237,
    'sort': -38810035,
    'spark': 16945254,
    'stream': 19045588,
    'table': 22645,
    'the': 4440333,
    'value': -1700388,
    'vector': 17637598,
    'window': 2265547,
}
