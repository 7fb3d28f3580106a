function solver = get_solver(solver_file)
% solver = get_solver(solver_file)
%   Build a caffe.Solver from a solver prototxt.
%   matcaffe API parity: matlab/+caffe/get_solver.m.

CHECK(ischar(solver_file), 'solver_file must be a string');
CHECK_FILE_EXIST(solver_file);
solver = caffe.Solver(caffe_('get_solver', solver_file));

end
