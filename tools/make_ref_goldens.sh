#!/bin/sh
# Regenerate tests/golden/ref_*.pfm from the REFERENCE binaries.
#
# The reference (embree-compressed, /root/reference) is built out-of-tree
# into .refbuild (gitignored):
#
#   mkdir -p .refbuild/build && cd .refbuild/build
#   cmake -G Ninja -DCMAKE_BUILD_TYPE=Release \
#     -DEMBREE_TASKING_SYSTEM=INTERNAL -DEMBREE_MAX_ISA=SSE2 \
#     -DEMBREE_TUTORIALS=ON -DEMBREE_ISPC_SUPPORT=OFF \
#     -DCMAKE_CXX_STANDARD=14 -DCMAKE_CXX_STANDARD_REQUIRED=ON \
#     -DEigen3_DIR=../eigen3 \
#     -DGLUT_INCLUDE_DIR=../glstub -DGLUT_glut_LIBRARY=../glstub/libglutstub.so \
#     -DOPENGL_INCLUDE_DIR=../glstub -DOPENGL_gl_LIBRARY=../glstub/libglutstub.so \
#     -DOPENGL_glu_LIBRARY=../glstub/libglutstub.so \
#     /root/reference && ninja viewer triangle_geometry displacement_geometry \
#     subdivision_geometry pathtracer
#
# (.refbuild/eigen3/Eigen3Config.cmake points EIGEN3_INCLUDE_DIR at the
# TF-bundled Eigen; .refbuild/glstub carries no-op GL/GLUT stubs so the
# offscreen -o path links without a display stack.)
set -e
B=${B:-.refbuild/build}
G=tests/golden

$B/triangle_geometry -o $G/ref_triangle_geometry_128.pfm --size 128 128 \
    --vp 1.5 1.5 -1.5 --vi 0 0 0
for m in leaf grid box; do
  $B/displacement_geometry -o $G/ref_displacement_${m}_64.pfm --size 64 64 \
      --vp 2.5 2.5 2.5 --vi 0 0 0 --compress.$m
done
# bomberman.ecs must run from a dir containing bomberman.obj
cp $G/bomberman.obj /tmp/ && cp /root/reference/build/bomberman.ecs /tmp/
(cd /tmp && $OLDPWD/$B/viewer -c bomberman.ecs -o $OLDPWD/$G/ref_bomberman_160.pfm \
    --size 160 96)
$B/subdivision_geometry -o $G/ref_subdivision_128.pfm --size 128 128 \
    --vp 1.5 1.5 -1.5 --vi 0 0 0
