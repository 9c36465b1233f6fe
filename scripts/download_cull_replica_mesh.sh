#!/bin/bash
# Download the culled Replica GT meshes used by eval_recon.
wget https://cvg-data.inf.ethz.ch/nice-slam/cull_replica_mesh.zip
unzip cull_replica_mesh.zip
