"""Places/rooms layer: distance field, place extraction, room segmentation."""

import numpy as np
import pytest

from khronos_tpu.stm.places import PlacesConfig, PlacesExtractor, chamfer_distance_field
import jax.numpy as jnp


def two_room_mesh(door_width=0.6):
    """Wall sample points for two 4x4 m rooms joined by a narrow doorway."""
    pts = []

    def wall(x0, y0, x1, y1, step=0.1):
        n = max(int(np.hypot(x1 - x0, y1 - y0) / step), 2)
        for t in np.linspace(0, 1, n):
            for z in np.arange(0.0, 2.4, 0.2):
                pts.append([x0 + t * (x1 - x0), y0 + t * (y1 - y0), z])

    # outer walls of a 8x4 box
    wall(0, 0, 8, 0)
    wall(0, 4, 8, 4)
    wall(0, 0, 0, 4)
    wall(8, 0, 8, 4)
    # divider at x=4 with a doorway around y=2
    wall(4, 0, 4, 2 - door_width / 2)
    wall(4, 2 + door_width / 2, 4, 4)
    # floor + ceiling samples
    for x in np.arange(0.2, 8.0, 0.4):
        for y in np.arange(0.2, 4.0, 0.4):
            pts.append([x, y, 0.0])
            pts.append([x, y, 2.4])
    return np.asarray(pts, np.float32)


class TestDistanceField:
    def test_chamfer_matches_manhattan_bound(self):
        occ = jnp.zeros((32, 32, 8), bool).at[16, 16, 4].set(True)
        d = np.asarray(chamfer_distance_field(occ, 0.5, 24))
        assert d[16, 16, 4] == 0.0
        # axis-aligned distances exact (separable chamfer = city-block metric)
        assert d[20, 16, 4] == pytest.approx(2.0, abs=1e-4)
        assert d[16, 10, 4] == pytest.approx(3.0, abs=1e-4)


class TestPlaces:
    def test_two_rooms_detected(self):
        verts = two_room_mesh()
        ex = PlacesExtractor(PlacesConfig(voxel_size=0.2, compression_distance=1.0,
                                          room_clearance=0.7, min_distance=0.3))
        layer = ex.extract(verts)
        assert len(layer.nodes) >= 4
        assert len(layer.edges) >= 2
        # clearances sane: all nodes inside free space
        for n in layer.nodes:
            assert 0.2 <= n.distance <= 5.0
        # two rooms split by the narrow doorway
        rooms = {n.room_id for n in layer.nodes}
        assert len(rooms) >= 2, f"rooms={rooms}"
        # nodes left of the divider are in a different room than right
        left = {n.room_id for n in layer.nodes if n.position[0] < 3.5}
        right = {n.room_id for n in layer.nodes if n.position[0] > 4.5}
        assert left and right and left.isdisjoint(right)

    def test_open_space_one_room(self):
        verts = two_room_mesh(door_width=3.5)  # wide opening -> one room
        ex = PlacesExtractor(PlacesConfig(voxel_size=0.2, compression_distance=1.0,
                                          room_clearance=0.7))
        layer = ex.extract(verts)
        left = {n.room_id for n in layer.nodes if n.position[0] < 3.5}
        right = {n.room_id for n in layer.nodes if n.position[0] > 4.5}
        assert left & right or len({n.room_id for n in layer.nodes}) == 1

    def test_empty_input(self):
        layer = PlacesExtractor().extract(np.zeros((0, 3), np.float32))
        assert len(layer.nodes) == 0

    def test_serialization_roundtrip(self, tmp_path):
        from khronos_tpu.stm import serialization
        from khronos_tpu.stm.scene_graph import SceneGraph

        verts = two_room_mesh()
        layer = PlacesExtractor(PlacesConfig(voxel_size=0.2)).extract(verts)
        dsg = SceneGraph()
        dsg.places = layer
        path = str(tmp_path / "dsg.npz")
        serialization.save_scene_graph(dsg, path)
        dsg2 = serialization.load_scene_graph(path)
        assert dsg2.places is not None
        assert len(dsg2.places.nodes) == len(layer.nodes)
        assert len(dsg2.places.edges) == len(layer.edges)
        np.testing.assert_allclose(dsg2.places.nodes[0].position, layer.nodes[0].position)


class TestIncrementalPlaces:
    """Per-output incremental frontend: delta occupancy + windowed splice."""

    def cfg(self):
        return PlacesConfig(
            voxel_size=0.2, compression_distance=1.0, room_clearance=0.7,
            min_distance=0.3, window_radius=3.2, window_margin=0.6,
        )

    def test_windowed_updates_cover_both_rooms(self):
        verts = two_room_mesh()
        ex = PlacesExtractor(self.cfg())
        # visit the left room first: only left geometry observed so far
        ex.add_mesh_delta(verts[verts[:, 0] <= 4.5])
        layer = ex.update_local(np.array([2.0, 2.0, 1.0]))
        assert len(layer.nodes) > 0
        assert all(n.position[0] < 4.8 for n in layer.nodes)
        # then the right room arrives as a later mesh delta
        ex.add_mesh_delta(verts[verts[:, 0] > 3.5])
        layer = ex.update_local(np.array([6.0, 2.0, 1.0]))
        # splice keeps the left-room nodes and adds right-room ones
        assert any(n.position[0] < 3.5 for n in layer.nodes)
        assert any(n.position[0] > 4.5 for n in layer.nodes)
        # the narrow doorway separates rooms
        left = {n.room_id for n in layer.nodes if n.position[0] < 3.5}
        right = {n.room_id for n in layer.nodes if n.position[0] > 4.5}
        assert left and right and left.isdisjoint(right)

    def test_incremental_matches_global_clearances(self):
        """Windowed clearances agree with the global field away from borders."""
        verts = two_room_mesh()
        g = PlacesExtractor(self.cfg()).extract(verts)
        ex = PlacesExtractor(self.cfg())
        ex.add_mesh_delta(verts)
        layer = ex.update_local(np.array([2.0, 2.0, 1.0]))
        g_nodes = {tuple(np.round(n.position, 3)): n.distance for n in g.nodes}
        for n in layer.nodes:
            key = tuple(np.round(n.position, 3))
            if key in g_nodes:
                assert abs(n.distance - g_nodes[key]) < 0.25

    def test_stale_geometry_purged_by_reset(self):
        verts = two_room_mesh()
        ex = PlacesExtractor(self.cfg())
        ex.add_mesh_delta(verts)
        ex.update_local(np.array([2.0, 2.0, 1.0]))
        # reconciliation removed the divider wall -> reset + re-extract
        keep = verts[np.abs(verts[:, 0] - 4.0) > 0.2]
        ex.reset_occupancy(keep)
        layer = ex.update_local(np.array([2.0, 2.0, 1.0]))
        # clearance near the removed divider grows
        near = [n for n in layer.nodes if abs(n.position[0] - 3.0) < 1.2
                and abs(n.position[1] - 2.0) < 1.2]
        assert near and max(n.distance for n in near) > 0.5

    def test_open_space_windows_do_not_fragment_rooms(self):
        """Sweeping windows across one open room must not split it into
        per-window islands (cross-window edges are re-sampled)."""
        verts = two_room_mesh(door_width=3.5)  # effectively one open space
        ex = PlacesExtractor(self.cfg())
        ex.add_mesh_delta(verts)
        for cx in (1.5, 4.0, 6.5):
            layer = ex.update_local(np.array([cx, 2.0, 1.0]))
        assert len(layer.nodes) >= 4
        left = {n.room_id for n in layer.nodes if n.position[0] < 3.5}
        right = {n.room_id for n in layer.nodes if n.position[0] > 4.5}
        # one shared room across the sweep (allow an isolated corner node)
        assert left & right, (left, right)
