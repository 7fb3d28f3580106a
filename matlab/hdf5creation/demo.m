%% Build an HDF5Data-layer dataset in batches, then verify by reading back.
% Reference workflow: matlab/hdf5creation/demo.m.

filename = 'trial.h5';
num_total_samples = 10000;
chunksz = 100;

% stand-ins for data streamed from disk
data_disk = rand(5, 5, 1, num_total_samples);
label_disk = rand(10, num_total_samples);

totalct = 0;
for batchno = 1:num_total_samples / chunksz
  fprintf('batch no. %d\n', batchno);
  sel = (batchno - 1) * chunksz + (1:chunksz);
  startloc = struct('dat', [1, 1, 1, totalct + 1], 'lab', [1, totalct + 1]);
  curr_dat_sz = store2hdf5(filename, data_disk(:, :, 1, sel), ...
    label_disk(:, sel), batchno == 1, startloc, chunksz);
  totalct = curr_dat_sz(end);
end

h5disp(filename);

%% read back samples 1000..1999 and compare
data_rd = h5read(filename, '/data', [1 1 1 1000], [5, 5, 1, 1000]);
label_rd = h5read(filename, '/label', [1 1000], [10, 1000]);
fprintf('Testing ...\n');
assert(isequal(data_rd, single(data_disk(:, :, :, 1000:1999))), ...
  'Data do not match');
assert(isequal(label_rd, single(label_disk(:, 1000:1999))), ...
  'Labels do not match');
fprintf('Success!\n');

%% list file for the HDF5Data layer's `source:` param
FILE = fopen('list.txt', 'w');
fprintf(FILE, '%s', filename);
fclose(FILE);
fprintf('HDF5 filename listed in %s \n', 'list.txt');

% In the net prototxt:
% layer { name: "data" type: "HDF5Data" top: "data" top: "labelvec"
%   hdf5_data_param { source: "/path/to/list.txt" batch_size: 64 } }
