"""Dataset class maps (ADE20K / VOC) used by the dynamic-object filter.

ADE20K_INDEX_FILT lists the 0-based indices (into the 150-class ADE20K
label set) of classes treated as dynamic/unreliable for SLAM -- sky,
people, vehicles, water bodies, animals, signboards (reference:
DINO_modules/datamaps.py:314-334; indices are public ADE20K metadata).
The reference stores them 1-based and subtracts 1 at load (slam.py:140);
here they are already 0-based.
"""

ADE20K_INDEX_FILT = [3, 13, 21, 22, 27, 44, 61, 81, 84, 91, 103, 104,
                     110, 114, 117, 127, 128, 129]

VOC2012_INDEX_FILT = [0]
