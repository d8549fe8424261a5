#!/bin/bash
cd /root/repo/.bench
P="timeout 900 python probe53_msa.py"
# A: the fix test — d=128 valley table (110 MB), MSA budget ladder
$P valley-default        312501 128 12
$P valley-msa110M        312501 128 12 115343360
$P valley-msa120M        312501 128 12 125829120
# B: why was real 40M d=192 slow? (83 MB table, should fit) lut vs nolut
$P d192-40M-lut          208334 192 12
$P d192-40M-nolut        208334 192 0
# C: identical-executable pair rates at d=192 (131 MB vs 521 MB)
$P d192-63M-lut          328126 192 12
$P d192-250M-lut        1302085 192 12
