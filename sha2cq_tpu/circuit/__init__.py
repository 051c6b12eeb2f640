"""Circuit construction layer: Value monad, Region/Layouter, floor planner.

Mirrors reference halo2_proofs/src/circuit{.rs,/}:
  - Value (circuit/value.rs): witness-optional wrapper with arithmetic
  - Region / Cell / AssignedCell (circuit.rs:93-196); note the fork's region
    API: region.assign_advice(column, offset, value) with no name closure
    (cf. halo2_proofs/tests/my_test.rs:83-102)
  - Layouter with `register_static_table` (circuit.rs:409-448) and
    `constrain_instance`
  - SimpleFloorPlanner / single-pass layouter (floor_planner/single_pass.rs):
    regions are laid out sequentially from the first free row

The layouter writes through an Assignment sink (plonk/keygen.py Assembly,
plonk/prover.py WitnessCollection, dev/mock_prover.py) exactly like the
reference's Assignment trait (plonk/circuit.rs:525-631).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Tuple

from ..fields.host import FR_MOD

P = FR_MOD


class Value:
    """Optional witness value with arithmetic that propagates absence
    (reference circuit/value.rs)."""

    __slots__ = ("_v",)

    def __init__(self, v: Optional[int] = None):
        self._v = v if v is None else v % P

    @staticmethod
    def known(v: int) -> "Value":
        return Value(v)

    @staticmethod
    def unknown() -> "Value":
        return Value(None)

    def is_known(self) -> bool:
        return self._v is not None

    def value(self) -> Optional[int]:
        return self._v

    def assign(self) -> int:
        if self._v is None:
            raise ValueError("synthesis error: value unknown")
        return self._v

    def map(self, f: Callable[[int], int]) -> "Value":
        return Value(None if self._v is None else f(self._v) % P)

    def _bin(self, other: "Value", f) -> "Value":
        if self._v is None or other._v is None:
            return Value(None)
        return Value(f(self._v, other._v) % P)

    def __add__(self, other):
        return self._bin(other, lambda a, b: a + b)

    def __mul__(self, other):
        return self._bin(other, lambda a, b: a * b)

    def __sub__(self, other):
        return self._bin(other, lambda a, b: a - b)

    def __repr__(self):
        return f"Value({self._v})"


@dataclass(frozen=True)
class Cell:
    region_index: int
    row_offset: int
    column: Column


@dataclass
class AssignedCell:
    cell: Cell
    value: Value


class Region:
    """A region view handed to the user's assignment closure; forwards to the
    Assignment sink with the region's absolute start row."""

    def __init__(self, layouter: "SingleChipLayouter", region_index: int, start: int):
        self._l = layouter
        self.region_index = region_index
        self.start = start
        self.rows_used = 0

    def _abs(self, offset: int) -> int:
        self.rows_used = max(self.rows_used, offset + 1)
        return self.start + offset

    def assign_advice(self, column: Column, offset: int, value: Value) -> AssignedCell:
        row = self._abs(offset)
        self._l.assignment.assign_advice(column, row, value)
        return AssignedCell(Cell(self.region_index, offset, column), value)

    def assign_advice_from_constant(self, column: Column, offset: int, constant: int) -> AssignedCell:
        cell = self.assign_advice(column, offset, Value.known(constant))
        self._l._assign_constant(constant, Cell(self.region_index, offset, column), self)
        return cell

    def assign_fixed(self, column: Column, offset: int, value: Value) -> AssignedCell:
        row = self._abs(offset)
        self._l.assignment.assign_fixed(column, row, value)
        return AssignedCell(Cell(self.region_index, offset, column), value)

    # -- bulk slice assignment (vectorized witness generation) ------------
    # The reference assigns cell-by-cell through Rust closures
    # (prover.rs:223-260); in Python that per-cell dispatch dominates big
    # circuits (SHA-256/64-block = ~570k cells per synthesis pass), so
    # regions accept whole column slices.  `values` are plain ints; cells
    # for copy constraints can be constructed with `self.cell(column, off)`.

    def assign_advice_slice(self, column: Column, offset: int, values) -> None:
        row0 = self.start + offset
        self.rows_used = max(self.rows_used, offset + len(values))
        sink = self._l.assignment
        fast = getattr(sink, "assign_advice_slice", None)
        if fast is not None:
            fast(column, row0, values)
        else:
            for i, v in enumerate(values):
                sink.assign_advice(column, row0 + i, Value.known(v))

    def assign_fixed_slice(self, column: Column, offset: int, values) -> None:
        row0 = self.start + offset
        self.rows_used = max(self.rows_used, offset + len(values))
        sink = self._l.assignment
        fast = getattr(sink, "assign_fixed_slice", None)
        if fast is not None:
            fast(column, row0, values)
        else:
            for i, v in enumerate(values):
                sink.assign_fixed(column, row0 + i, Value.known(v))

    def cell(self, column: Column, offset: int) -> Cell:
        """Cell handle for a slice-assigned position (for constrain_equal /
        constrain_instance)."""
        return Cell(self.region_index, offset, column)

    def assign_advice_from_instance(
        self, instance: Column, instance_row: int, advice: Column, offset: int
    ) -> AssignedCell:
        v = self._l.assignment.query_instance(instance, instance_row)
        cell = self.assign_advice(advice, offset, v)
        self._l.assignment.copy(instance, instance_row, advice, self.start + offset)
        return cell

    def enable_selector(self, selector: Selector, offset: int) -> None:
        row = self._abs(offset)
        self._l.assignment.enable_selector(selector, row)

    def constrain_equal(self, a: Cell, b: Cell) -> None:
        self._l.assignment.copy(
            a.column, self._l.region_starts[a.region_index] + a.row_offset,
            b.column, self._l.region_starts[b.region_index] + b.row_offset,
        )

    def constrain_constant(self, cell: Cell, constant: int) -> None:
        self._l._assign_constant(constant, cell, self)

    def get_challenge(self, challenge) -> Value:
        """Phase challenge value: known once the challenge's phase has been
        squeezed, Value.unknown() before (reference Layouter::get_challenge)."""
        sink = self._l.assignment
        if hasattr(sink, "get_challenge"):
            return sink.get_challenge(challenge)
        return Value.unknown()


class Table:
    """Dynamic-lookup fixed table view (reference circuit.rs:368)."""

    def __init__(self, layouter: "SingleChipLayouter", start: int):
        self._l = layouter
        self.start = start
        self.rows_used = 0

    def assign_cell(self, column: TableColumn, offset: int, value: Value) -> None:
        self.rows_used = max(self.rows_used, offset + 1)
        self._l.assignment.assign_fixed(column.inner, self.start + offset, value)


class SingleChipLayouter:
    """Sequential region placement (floor_planner/single_pass.rs:43)."""

    def __init__(self, assignment, constants: List[Column]):
        self.assignment = assignment
        self.constants = constants
        self.region_starts: List[int] = []
        self.cursor = 0
        self._constants_to_assign: List[Tuple[int, Cell]] = []
        self._constant_row = 0

    def assign_region(self, name, f: Callable[[Region], Any]):
        index = len(self.region_starts)
        start = self.cursor
        self.region_starts.append(start)
        self.assignment.enter_region(name)
        region = Region(self, index, start)
        result = f(region)
        self.assignment.exit_region()
        self.cursor = start + region.rows_used
        return result

    def assign_table(self, name, f: Callable[[Table], Any]):
        # tables occupy rows from 0 of their fixed columns; they share the
        # sequential cursor for simplicity (sound; may use more rows)
        table = Table(self, 0)
        self.assignment.enter_region(name)
        result = f(table)
        self.assignment.exit_region()
        return result

    def constrain_instance(self, cell: Cell, instance: Column, row: int) -> None:
        self.assignment.copy(
            cell.column, self.region_starts[cell.region_index] + cell.row_offset,
            instance, row,
        )

    def register_static_table(self, table_id: StaticTableId, table) -> None:
        self.assignment.register_static_table(table_id, table)

    def next_phase(self) -> None:
        self.assignment.next_phase()

    def _assign_constant(self, constant: int, cell: Cell, region: Region) -> None:
        if not self.constants:
            raise ValueError("no constants column configured (enable_constant)")
        col = self.constants[0]
        row = self._constant_row
        self._constant_row += 1
        self.assignment.assign_fixed(col, row, Value.known(constant))
        self.assignment.copy(
            col, row,
            cell.column, self.region_starts[cell.region_index] + cell.row_offset,
        )


class SimpleFloorPlanner:
    """reference floor_planner/single_pass.rs:27: one pass, no measurement."""

    @staticmethod
    def synthesize(assignment, circuit, config, constants: List[Column]):
        layouter = SingleChipLayouter(assignment, constants)
        return circuit.synthesize(config, layouter)


# --------------------------- V1 floor planner --------------------------------

class _RegionShape:
    def __init__(self, name):
        self.name = name
        self.columns: set = set()
        self.rows = 0


class _ShapeRegion:
    """Measure-pass region: records the columns touched and the row extent;
    assignments never reach the sink (reference circuit/layouter.rs
    RegionShape)."""

    def __init__(self, shape: _RegionShape, region_index: int):
        self._shape = shape
        self.region_index = region_index

    def _touch(self, column, offset: int):
        self._shape.columns.add(column)
        self._shape.rows = max(self._shape.rows, offset + 1)

    def assign_advice(self, column, offset, value) -> AssignedCell:
        self._touch(column, offset)
        return AssignedCell(Cell(self.region_index, offset, column), value)

    def assign_advice_from_constant(self, column, offset, constant) -> AssignedCell:
        return self.assign_advice(column, offset, Value.known(constant))

    def assign_fixed(self, column, offset, value) -> AssignedCell:
        self._touch(column, offset)
        return AssignedCell(Cell(self.region_index, offset, column), value)

    def assign_advice_from_instance(self, instance, instance_row, advice, offset):
        return self.assign_advice(advice, offset, Value.unknown())

    def assign_advice_slice(self, column, offset, values) -> None:
        self._touch(column, offset + len(values) - 1)

    def assign_fixed_slice(self, column, offset, values) -> None:
        self._touch(column, offset + len(values) - 1)

    def cell(self, column, offset: int) -> Cell:
        return Cell(self.region_index, offset, column)

    def enable_selector(self, selector, offset) -> None:
        self._shape.rows = max(self._shape.rows, offset + 1)

    def constrain_equal(self, a, b) -> None:
        pass

    def constrain_constant(self, cell, constant) -> None:
        pass

    def get_challenge(self, challenge) -> Value:
        return Value.unknown()


class _ShapeLayouter:
    """Measure pass: collects region shapes, performs no assignments."""

    def __init__(self, assignment):
        self.assignment = assignment
        self.regions: List[_RegionShape] = []

    def assign_region(self, name, f):
        shape = _RegionShape(name)
        index = len(self.regions)
        self.regions.append(shape)
        return f(_ShapeRegion(shape, index))

    def assign_table(self, name, f):
        pass  # tables are pinned at row 0; assigned in the second pass

    def constrain_instance(self, cell, instance, row) -> None:
        pass

    def register_static_table(self, table_id, table) -> None:
        pass

    def next_phase(self) -> None:
        pass


def slot_in_biggest_first(shapes: List[_RegionShape]) -> List[int]:
    """v1/strategy.rs:265 analogue: place regions biggest-first at the
    earliest start where none of their columns overlap an already-placed
    region; returns per-region start rows in original region order."""
    order = sorted(range(len(shapes)), key=lambda i: -(len(shapes[i].columns)
                                                       * shapes[i].rows))
    col_intervals: dict = {}
    starts = [0] * len(shapes)
    for i in order:
        shape = shapes[i]
        start = 0
        while True:
            end = start + shape.rows
            clash = None
            for col in shape.columns:
                for (lo, hi) in col_intervals.get(col, ()):
                    if lo < end and start < hi:
                        clash = hi
                        break
                if clash is not None:
                    break
            if clash is None:
                break
            start = clash
        starts[i] = start
        for col in shape.columns:
            col_intervals.setdefault(col, []).append((start, start + shape.rows))
    return starts


class _PlannedLayouter(SingleChipLayouter):
    """Assignment pass with predetermined region start rows."""

    def __init__(self, assignment, constants, starts: List[int]):
        super().__init__(assignment, constants)
        self._starts = starts

    def assign_region(self, name, f):
        index = len(self.region_starts)
        start = self._starts[index]
        self.region_starts.append(start)
        self.assignment.enter_region(name)
        region = Region(self, index, start)
        result = f(region)
        self.assignment.exit_region()
        self.cursor = max(self.cursor, start + region.rows_used)
        return result


class V1FloorPlanner:
    """Two-pass floor planner (reference floor_planner/v1.rs + v1/strategy.rs):
    measure every region's column/row footprint, slot regions biggest-first
    into the earliest rows where their columns are free (column-disjoint
    regions overlap in rows), then synthesize for real at the planned starts."""

    @staticmethod
    def synthesize(assignment, circuit, config, constants: List[Column]):
        shape_l = _ShapeLayouter(assignment)
        circuit.synthesize(config, shape_l)
        starts = slot_in_biggest_first(shape_l.regions)
        layouter = _PlannedLayouter(assignment, constants, starts)
        return circuit.synthesize(config, layouter)


def planner_for(circuit):
    """The circuit's floor planner (FLOOR_PLANNER class attribute, default
    SimpleFloorPlanner) — reference Circuit::FloorPlanner associated type."""
    return getattr(type(circuit), "FLOOR_PLANNER", SimpleFloorPlanner)
