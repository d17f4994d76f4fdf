// Small fixed-size dense matrices for the realtime estimators.
//
// The reference links Eigen for its Kalman filters (src/car/kalman_filter.cc);
// the realtime path only needs tiny (<=3x3) dense ops, so this header keeps
// the car stack dependency-free.
#ifndef PGCAR_MATRIX_H_
#define PGCAR_MATRIX_H_

#include <array>
#include <cstddef>

namespace pgcar {

template <size_t Rows, size_t Cols> class Matrix {
 public:
  Matrix() : data_{} {}

  static Matrix Identity() {
    static_assert(Rows == Cols, "identity requires a square matrix");
    Matrix m;
    for (size_t i = 0; i < Rows; ++i) m(i, i) = 1.0;
    return m;
  }

  double &operator()(size_t r, size_t c) { return data_[r * Cols + c]; }
  double operator()(size_t r, size_t c) const { return data_[r * Cols + c]; }

  Matrix operator+(const Matrix &other) const {
    Matrix out;
    for (size_t i = 0; i < Rows * Cols; ++i) out.data_[i] = data_[i] + other.data_[i];
    return out;
  }

  Matrix operator-(const Matrix &other) const {
    Matrix out;
    for (size_t i = 0; i < Rows * Cols; ++i) out.data_[i] = data_[i] - other.data_[i];
    return out;
  }

  Matrix operator*(double s) const {
    Matrix out;
    for (size_t i = 0; i < Rows * Cols; ++i) out.data_[i] = data_[i] * s;
    return out;
  }

  template <size_t OtherCols>
  Matrix<Rows, OtherCols> operator*(const Matrix<Cols, OtherCols> &other) const {
    Matrix<Rows, OtherCols> out;
    for (size_t r = 0; r < Rows; ++r)
      for (size_t c = 0; c < OtherCols; ++c) {
        double acc = 0.0;
        for (size_t k = 0; k < Cols; ++k) acc += (*this)(r, k) * other(k, c);
        out(r, c) = acc;
      }
    return out;
  }

  Matrix<Cols, Rows> Transposed() const {
    Matrix<Cols, Rows> out;
    for (size_t r = 0; r < Rows; ++r)
      for (size_t c = 0; c < Cols; ++c) out(c, r) = (*this)(r, c);
    return out;
  }

 private:
  std::array<double, Rows * Cols> data_;
};

template <size_t D> using Vector = Matrix<D, 1>;

}  // namespace pgcar

#endif  // PGCAR_MATRIX_H_
