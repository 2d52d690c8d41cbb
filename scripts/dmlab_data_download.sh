#!/bin/sh
# Fetch the object-image dataset DMLab levels need at runtime and convert it
# to the numbered-PNG layout DMLab expects. (reference: scripts/dmlab_data_download.sh)
set -e
mkdir -p dmlab_data
cd dmlab_data

curl https://bradylab.ucsd.edu/stimuli/ObjectsAll.zip -o ObjectsAll.zip
unzip ObjectsAll.zip

cd OBJECTSALL
python3 - <<'EOM'
import os
from PIL import Image
files = sorted(f for f in os.listdir('.') if f.lower().endswith('jpg'))
for i, name in enumerate(files):
    print(name)
    Image.open(name).save('../%04d.png' % (i + 1))
EOM
cd ..

rm -rf __MACOSX OBJECTSALL ObjectsAll.zip
