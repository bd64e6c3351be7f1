package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable

/** Narrow Python-pickle reader for the sarwing axis files
  * (`incidence_angle.pkl`, `wind_speed_and_direction.pkl`,
  * `wind_speed.pkl` — windspeed/pickle_luts.py:29-40): enough of the
  * protocol-2..5 opcode set to load numpy 1-D arrays, tuples/lists of
  * arrays, and plain float lists. This is NOT a general unpickler — any
  * global other than numpy's array-reconstruction trio
  * (`_reconstruct`/`ndarray`/`dtype`) or `_codecs.encode` is rejected, so
  * no arbitrary-code surface exists (the pickle "reduce" gadget only ever
  * dispatches to those four hard-coded constructors).
  *
  * Format knowledge is from the public pickle module docs/pickletools and
  * numpy's public `__reduce__` layout: `_reconstruct(ndarray, (0,), b'b')`
  * then BUILD with state `(1, shape, dtype, fortran, dataBytes)`; dtype
  * `('f8', False, True)` then BUILD with state carrying the byte order.
  */
object Pickle {

  final case class Global(module: String, name: String)
  final class ArrayStub {
    var shape: Seq[Int] = Nil
    var descr: String = ""
    var littleEndian: Boolean = true
    var fortran: Boolean = false
    var data: Array[Byte] = Array.empty
  }
  final class DtypeStub(val descr: String) { var littleEndian: Boolean = true }
  private object Mark

  def load(path: String): Any = loads(Files.readAllBytes(Paths.get(path)))

  def loads(bytes: Array[Byte]): Any = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val stack = mutable.ArrayDeque.empty[Any] // push/pop at head
    val memo = mutable.Map.empty[Int, Any]
    var memoCounter = 0

    def push(v: Any): Unit = stack.prepend(v)
    def pop(): Any = stack.removeHead()
    def popToMark(): List[Any] = {
      val out = mutable.ListBuffer.empty[Any]
      while (stack.head != Mark) out.prepend(pop())
      pop() // the mark
      out.toList
    }
    def readBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); bb.get(a); a
    }
    def readLine(): String = {
      val sb = new StringBuilder
      var c = bb.get()
      while (c != '\n') { sb.append(c.toChar); c = bb.get() }
      sb.toString
    }

    def reduce(callable: Any, args: Any): Any = (callable, args) match {
      case (Global("numpy.core.multiarray" | "numpy._core.multiarray", "_reconstruct"), _) =>
        new ArrayStub
      case (Global("numpy", "dtype"), t: Seq[_]) =>
        new DtypeStub(t.head.asInstanceOf[String])
      case (Global("_codecs", "encode"), Seq(s: String, enc: String)) =>
        require(enc.equalsIgnoreCase("latin1") || enc.equalsIgnoreCase("iso-8859-1"),
          s"unsupported _codecs.encode encoding $enc")
        s.getBytes("ISO-8859-1")
      case (g: Global, _) =>
        sys.error(s"unsupported pickle global ${g.module}.${g.name} — " +
          "this reader only loads numpy arrays and float lists")
      case other => sys.error(s"unsupported REDUCE target $other")
    }

    def build(target: Any, state: Any): Any = (target, state) match {
      case (a: ArrayStub, Seq(_, shape: Seq[_], dt: DtypeStub, fortran: Boolean, data)) =>
        a.shape = shape.map(_.asInstanceOf[Int])
        a.descr = dt.descr
        a.littleEndian = dt.littleEndian
        a.fortran = fortran
        a.data = data match {
          case b: Array[Byte] => b
          case s: String => s.getBytes("ISO-8859-1")
          case other => sys.error(s"unexpected ndarray data payload $other")
        }
        a
      case (d: DtypeStub, s: Seq[_]) if s.length >= 2 =>
        s(1) match {
          case ">" => sys.error("big-endian numpy pickles unsupported")
          case _ => d.littleEndian = true
        }
        d
      case other => sys.error(s"unsupported BUILD $other")
    }

    var result: Option[Any] = None
    while (result.isEmpty) {
      val op = bb.get() & 0xff
      op match {
        case 0x80 => bb.get() // PROTO version
        case 0x95 => bb.position(bb.position() + 8) // FRAME length
        case '.' => result = Some(pop())
        case '(' => push(Mark)
        case ')' => push(Seq.empty[Any])
        case 't' => push(popToMark().toSeq) // TUPLE
        case 0x85 => push(Seq(pop())) // TUPLE1
        case 0x86 => val b2 = pop(); val a2 = pop(); push(Seq(a2, b2))
        case 0x87 => val c3 = pop(); val b3 = pop(); val a3 = pop(); push(Seq(a3, b3, c3))
        case ']' => push(mutable.ListBuffer.empty[Any]) // EMPTY_LIST
        case 'a' => val v = pop(); stack.head.asInstanceOf[mutable.ListBuffer[Any]] += v
        case 'e' =>
          val items = popToMark()
          stack.head.asInstanceOf[mutable.ListBuffer[Any]] ++= items
        case 'N' => push(null)
        case 0x88 => push(true)
        case 0x89 => push(false)
        case 'J' => push(bb.getInt())
        case 'K' => push(bb.get() & 0xff)
        case 'M' => push(bb.getShort() & 0xffff)
        case 0x8a => // LONG1
          val n = bb.get() & 0xff
          val raw = readBytes(n)
          var v = 0L
          var i = n - 1
          while (i >= 0) { v = (v << 8) | (raw(i) & 0xffL); i -= 1 }
          if (n > 0 && (raw(n - 1) & 0x80) != 0) v -= (1L << (8 * n))
          push(v)
        case 'G' => push(ByteBuffer.wrap(readBytes(8)).getDouble) // BINFLOAT big-endian
        case 'c' => push(Global(readLine(), readLine())) // GLOBAL
        case 0x93 => val nm = pop().asInstanceOf[String]; push(Global(pop().asInstanceOf[String], nm))
        case 'R' => val args = pop(); push(reduce(pop(), args))
        case 'b' => val state = pop(); push(build(pop(), state))
        case 'q' => memo(bb.get() & 0xff) = stack.head
        case 'r' => memo(bb.getInt()) = stack.head
        case 'h' => push(memo(bb.get() & 0xff))
        case 'j' => push(memo(bb.getInt()))
        case 0x94 => memo(memoCounter) = stack.head; memoCounter += 1
          // proto-2 BINPUT uses explicit slots; MEMOIZE counts — a file mixes
          // one scheme only, so sharing the map is safe
        case 'X' => push(new String(readBytes(bb.getInt()), "UTF-8")) // BINUNICODE
        case 0x8c => push(new String(readBytes(bb.get() & 0xff), "UTF-8"))
        case 'U' => push(new String(readBytes(bb.get() & 0xff), "ISO-8859-1")) // SHORT_BINSTRING
        case 'T' => push(new String(readBytes(bb.getInt()), "ISO-8859-1")) // BINSTRING
        case 'B' => push(readBytes(bb.getInt())) // BINBYTES
        case 'C' => push(readBytes(bb.get() & 0xff)) // SHORT_BINBYTES
        case 0x8e => // BINBYTES8
          val n = bb.getLong()
          push(readBytes(n.toInt))
        case other =>
          sys.error(f"unsupported pickle opcode 0x$other%02x at ${bb.position() - 1}")
      }
    }
    result.get
  }

  /** Decode any supported pickled value into a double array: a numpy array
    * stub, or a list/tuple of numbers. */
  def toDoubles(v: Any): Array[Double] = v match {
    case a: ArrayStub =>
      require(a.littleEndian, "big-endian arrays unsupported")
      val vb = ByteBuffer.wrap(a.data).order(ByteOrder.LITTLE_ENDIAN)
      val n = if (a.shape.isEmpty) 1 else a.shape.product
      val out = new Array[Double](n)
      a.descr match {
        case "f8" => var i = 0; while (i < n) { out(i) = vb.getDouble; i += 1 }
        case "f4" => var i = 0; while (i < n) { out(i) = vb.getFloat.toDouble; i += 1 }
        case "i8" => var i = 0; while (i < n) { out(i) = vb.getLong.toDouble; i += 1 }
        case "i4" => var i = 0; while (i < n) { out(i) = vb.getInt.toDouble; i += 1 }
        case "i2" => var i = 0; while (i < n) { out(i) = vb.getShort.toDouble; i += 1 }
        case d => sys.error(s"unsupported numpy descr $d")
      }
      out
    case s: collection.Seq[_] => s.map {
      case d: Double => d
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other => sys.error(s"non-numeric list element $other")
    }.toArray
    case other => sys.error(s"cannot convert $other to doubles")
  }

  /** A pickled (phi, wspd) pair — `wind_speed_and_direction.pkl`. */
  def toDoublePair(v: Any): (Array[Double], Array[Double]) = v match {
    case Seq(a, b) => (toDoubles(a), toDoubles(b))
    case s: mutable.ListBuffer[_] if s.length == 2 => (toDoubles(s(0)), toDoubles(s(1)))
    case other => sys.error(s"expected a 2-element pickled sequence, got $other")
  }
}
