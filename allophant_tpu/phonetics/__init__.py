"""Phonetic-knowledge layer: feature tables, inventories, segmentation, language codes.

Host-side (numpy/pandas) counterpart of the reference's L1 layer
(/root/reference/allophant/phonetic_features.py, phoneme_segmentation.py,
language_codes.py, attribute_graph.py). Device code only ever sees dense integer
feature matrices produced here.
"""
